"""Accuracy-parity artifact gate: torch reference vs coastline RobustUNet.

`scripts/parity_robust_unet.py` trains the reference's ACTUAL torch
RobustUNet + ModelEvaluator protocol (`/root/reference/Main_Final.py:
549-668`, imported at runtime) and the coastline RobustUNet at the FULL
Main_Final protocol scale — 512^2 scenes, 40/10 sequential split, 20
epochs, batch 2, lr 1e-4 (`Main_Final.py:862-865,692-694`) — multi-seed
per side, and aggregates `artifacts/parity_robust_unet/parity.json`.

This test pins the outcome with a gate sized by the measured seed-to-seed
spread (VERDICT r2 item 1: <= 0.01, vs round 2's loose 0.05 at toy
scale). A torch seed is ~6.5 h of 1-vCPU compute, so the test consumes
the committed artifact rather than re-running; torch-side assertions
skip while that side hasn't been generated yet.
"""

import json
import pathlib

import pytest

ART_DIR = (
    pathlib.Path(__file__).resolve().parent.parent
    / "artifacts" / "parity_robust_unet"
)

# Full-protocol configuration the artifact must have been produced under.
PROTOCOL = {"size": 512, "n": 50, "epochs": 20, "batch_size": 2, "lr": 1e-4}

# |mean IoU delta| gate: >= 3x the measured coastline seed-to-seed std
# (2.8e-4, parity.json) with headroom for the torch side's own draw,
# and 5x tighter than round 2's gate.
IOU_GATE = 0.01


@pytest.fixture(scope="module")
def parity():
    path = ART_DIR / "parity.json"
    if not path.exists():
        pytest.skip("parity artifact not generated (scripts/parity_robust_unet.py)")
    return json.loads(path.read_text())


def test_protocol_is_full_scale(parity):
    assert parity["config"] == PROTOCOL


def test_coastline_multiseed_converges_tightly(parity):
    cl = parity["coastline"]
    assert cl["n"] >= 3, "need >= 3 independent coastline seeds"
    assert cl["final_iou_mean"] > 0.99, cl
    # seed-to-seed spread must be small enough to make the delta gate
    # meaningful (the published reference spread is 0.003, README.md:10)
    assert cl["final_iou_std"] < 0.003, cl


def test_coastline_trajectories_track(parity):
    """Every cached coastline run must actually train (no frozen-model
    pathology): loss collapses, IoU ends where it started climbing to."""
    for run in parity["coastline_runs"]:
        cache = json.loads((ART_DIR / run["cache"]).read_text())
        h = cache["result"]["history"]
        assert h["train_loss"][-1] < 0.1 * h["train_loss"][0], run["cache"]
        assert h["val_iou"][-1] > 0.99, run["cache"]


def test_final_iou_agreement_with_torch(parity):
    if not parity["torch"]["n"]:
        pytest.skip("torch side still training (hours of 1-vCPU compute)")
    assert parity["torch"]["final_iou_mean"] > 0.95
    assert parity["iou_delta"] < IOU_GATE, parity["iou_delta"]


def test_bfloat16_agreement(parity):
    """The TPU-production dtype (bf16 compute, f32 params/BN) is its own
    comparison axis — a seed must not appear twice in the primary f32
    multi-seed mean — and must land inside the same gate."""
    bf = parity.get("coastline_bfloat16") or {}
    if not bf.get("n"):
        pytest.skip("bfloat16 run not generated")
    assert bf["final_iou_mean"] > 0.99, bf
    if "bfloat16_iou_delta" not in parity:
        pytest.skip("torch side still training")
    assert parity["bfloat16_iou_delta"] < IOU_GATE, parity["bfloat16_iou_delta"]


def test_sameinit_agreement(parity):
    """Starting coastline from the torch seed's bit-identical initial
    weights isolates optimizer/BN/data-order effects from init-draw
    variance; the same-init delta must sit inside the gate too."""
    if not parity.get("coastline_sameinit_runs"):
        pytest.skip("same-init run not generated")
    if "sameinit_iou_delta" not in parity:
        pytest.skip("torch side still training")
    assert parity["sameinit_iou_delta"] < IOU_GATE, parity["sameinit_iou_delta"]
