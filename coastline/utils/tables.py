"""Console result tables (parity with the reference's final-comparison
printout, `/root/reference/Main_Final.py:886-909`)."""

from typing import Dict


def format_results_table(results: Dict[str, dict], param_counts: Dict[str, int]) -> str:
    lines = []
    lines.append("=" * 75)
    lines.append("FINAL COMPARISON RESULTS")
    lines.append("=" * 75)
    lines.append(
        f"{'Method':<15} {'IoU':<10} {'F1-Score':<10} {'Accuracy':<10} "
        f"{'Parameters':<12} {'Time(ms)':<10}"
    )
    lines.append("-" * 75)
    for name, r in results.items():
        lines.append(
            f"{name:<15} "
            f"{r['mean_iou']:.4f}    "
            f"{r['mean_f1_score']:.4f}     "
            f"{r['mean_accuracy']:.4f}     "
            f"{param_counts.get(name, 0) / 1e6:.1f}M        "
            f"{r['avg_inference_time'] * 1000:.2f}"
        )
    if results:
        best_iou = max(results.items(), key=lambda kv: kv[1]["mean_iou"])
        best_f1 = max(results.items(), key=lambda kv: kv[1]["mean_f1_score"])
        best_acc = max(results.items(), key=lambda kv: kv[1]["mean_accuracy"])
        lines.append("")
        lines.append("WINNER ANALYSIS:")
        lines.append(f"  Best IoU: {best_iou[0]} ({best_iou[1]['mean_iou']:.4f})")
        lines.append(f"  Best F1-Score: {best_f1[0]} ({best_f1[1]['mean_f1_score']:.4f})")
        lines.append(f"  Best Accuracy: {best_acc[0]} ({best_acc[1]['mean_accuracy']:.4f})")
    return "\n".join(lines)
