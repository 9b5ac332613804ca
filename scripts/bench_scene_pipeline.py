"""Pipelined vs sequential multi-scene extraction on the real chip.

The per-year batch workflow (`predict --batch --scene`, feeding cli.change)
used to process scenes strictly sequentially: load -> dispatch -> BLOCK on
the mask download -> contours -> save, so the chip idled during every host
stage and the host idled during every device stage. `extract_scenes` now
software-pipelines the loop over JAX async dispatch: scene N+1 is uploaded
and computed while the host traces contours and writes artifacts for
scene N (double-buffered, `pipeline_depth=2`).

This measures both loops wall-clock over N same-geometry scenes, in the
two real modes:
  - light (no output_dir): host work = PNG decode + contour tracing
  - full  (output_dir):    + mask/band PNG writes, polylines JSON,
                            matplotlib analysis figure

Writes artifacts/scene_pipeline.json.
"""

import json
import pathlib
import tempfile
import time

import numpy as np
from PIL import Image

from coastline.data.synthetic import make_scene
from coastline.infer.extract import CoastlineExtractor

OUT = (pathlib.Path(__file__).resolve().parents[1]
       / "artifacts" / "scene_pipeline.json")
SIZE = 2048
N_SCENES = 6
DILATION = 20


def build_scene(seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    tiles = [make_scene(rng, size=512)[0] for _ in range(16)]
    return np.concatenate(
        [np.concatenate(tiles[r * 4:(r + 1) * 4], axis=1) for r in range(4)],
        axis=0)


def sequential(ex, paths, out_dir):
    return [ex.extract_scene(p, out_dir, dilation_size=DILATION)
            for p in paths]


def pipelined(ex, paths, out_dir):
    return ex.extract_scenes(paths, out_dir, dilation_size=DILATION,
                             pipeline_depth=2)


def main():
    tmp = tempfile.mkdtemp(prefix="scene_pipe_")
    paths = []
    for i in range(N_SCENES):
        p = f"{tmp}/y{2017 + i}.png"
        Image.fromarray(build_scene(i)).save(p)
        paths.append(p)

    ex = CoastlineExtractor(image_size=512)  # random weights: timing only

    # warm: compile the scene program for this geometry + warm PIL/mpl paths
    ex.extract_scene(paths[0], f"{tmp}/warm", dilation_size=DILATION)

    result = {"scene": f"{SIZE}x{SIZE}", "n_scenes": N_SCENES,
              "dilation_size": DILATION}
    for mode, out_dir in (("light", None), ("full", f"{tmp}/out")):
        t0 = time.perf_counter()
        seq = sequential(ex, paths, out_dir and out_dir + "_seq")
        t_seq = time.perf_counter() - t0
        t0 = time.perf_counter()
        pipe = pipelined(ex, paths, out_dir and out_dir + "_pipe")
        t_pipe = time.perf_counter() - t0
        for a, b in zip(seq, pipe):  # identical outputs, not just faster
            np.testing.assert_array_equal(a["water_mask"], b["water_mask"])
            np.testing.assert_array_equal(a["coastline_mask"],
                                          b["coastline_mask"])
        result[mode] = {
            "sequential_s": round(t_seq, 3),
            "pipelined_s": round(t_pipe, 3),
            "sequential_scenes_per_s": round(N_SCENES / t_seq, 3),
            "pipelined_scenes_per_s": round(N_SCENES / t_pipe, 3),
            "speedup": round(t_seq / t_pipe, 3),
        }
        print(mode, json.dumps(result[mode]))

    result["note"] = (
        "same 6 scenes, same artifacts (asserted equal); 'light' has no "
        "artifact writes (host = decode + contours), 'full' writes the "
        "complete artifact set incl. the matplotlib analysis figure. "
        "Speedup = overlap of device upload/compute/stitch/download with "
        "host work via JAX async dispatch (extract_scenes, depth 2).")
    OUT.write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
