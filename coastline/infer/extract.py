"""Coastline extraction: segmentation -> mask -> dilation band -> polylines.

Capability parity with `CoastlineExtractor`
(`/root/reference/predict_coastline.py:336-846`): loads the production
2-class U-Net, predicts a water mask at 512^2, NEAREST-resizes to native
resolution, extracts the dilated coastline band and simplified contour
polylines, writes `{base}_water_mask.png`, `{base}_coastline_mask.png`,
`{base}_coastlines.json` and a CoastSat-style analysis figure.

TPU redesign: the forward + argmax run jitted on device (optionally batched
over many images or scene tiles via data.tiling); dilation is a device
convolution (infer.morphology); only contour tracing and PNG/JSON encoding
run on host.
"""

import json
import os
from datetime import datetime
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from coastline.data.pipeline import IMAGENET_MEAN, IMAGENET_STD
from coastline.infer.contours import extract_contours
from coastline.infer.morphology import coastline_band
from coastline.models.unet import UNet


def _make_predict_fn(logits_fn, tta: bool = False):
    """Build the jitted serving fn (predict_params, x_u8) -> uint8 masks.

    `logits_fn(predict_params, x_normalized) -> (N,H,W,2)` supplies the
    model forward (float or int8 graph). With `tta=True` the mask comes
    from an 8-term flip/transpose (D4 symmetry-group) ensemble fused into
    the SAME jitted program: class probabilities are averaged in f32 over
    identity, H-flip, V-flip, 180°, transpose, and the three
    transpose+flip compositions, each inverted before averaging.

    Measured on-chip on trained flagships (scripts/eval_tta.py,
    artifacts/tta_eval.json): cost is ~8.4x (the model is bandwidth-bound,
    so 8 forwards cost 8x traffic); accuracy is NEUTRAL on clean protocol
    data (delta -3e-4..-1e-4 IoU) and situational under input corruption —
    it recovered one noise-degraded seed by +0.13 IoU while slightly
    hurting another. Default off; a robustness option for degraded inputs,
    not a free accuracy knob. The reference has no ensemble inference path.
    """
    mean, std = jnp.asarray(IMAGENET_MEAN), jnp.asarray(IMAGENET_STD)

    def predict(predict_params, x_u8):
        x = (x_u8.astype(jnp.float32) / 255.0 - mean) / std
        if not tta:
            return jnp.argmax(
                logits_fn(predict_params, x), axis=-1).astype(jnp.uint8)

        def probs_of(xi):
            return jax.nn.softmax(
                logits_fn(predict_params, xi).astype(jnp.float32), axis=-1)

        acc = probs_of(x)
        for axes in ((1,), (2,), (1, 2)):
            acc = acc + jnp.flip(probs_of(jnp.flip(x, axes)), axes)
        # square inputs also get the transposed half of the D4 group
        if x.shape[1] == x.shape[2]:
            xt = jnp.swapaxes(x, 1, 2)
            acc = acc + jnp.swapaxes(probs_of(xt), 1, 2)
            for axes in ((1,), (2,), (1, 2)):
                p = jnp.flip(probs_of(jnp.flip(xt, axes)), axes)
                acc = acc + jnp.swapaxes(p, 1, 2)
        return jnp.argmax(acc, axis=-1).astype(jnp.uint8)

    return jax.jit(predict)


class CoastlineExtractor:
    def __init__(
        self,
        checkpoint_dir: Optional[str] = None,
        variables: Optional[dict] = None,
        torch_checkpoint: Optional[str] = None,
        dtype=jnp.float32,
        image_size: int = 512,
        tta: bool = False,
    ):
        self.model = UNet(n_classes=2, dtype=dtype)
        self.image_size = image_size
        self.tta = tta
        if variables is not None:
            self.variables = variables
        elif torch_checkpoint is not None:
            # a reference-era .pth (e.g. models/best_water_segmentation_model.pth)
            import torch

            from coastline.utils.torch_import import import_reference_checkpoint

            sd = torch.load(torch_checkpoint, map_location="cpu")
            arch, self.variables = import_reference_checkpoint(sd)
            if arch != "UNet":
                raise ValueError(
                    f"{torch_checkpoint} is a {arch!r} checkpoint; the "
                    "extractor's 2-class argmax pipeline expects the "
                    "reference UNet artifact. Convert it with "
                    "coastline.utils.torch_import.import_reference_checkpoint "
                    f"and run create_model({arch!r}) directly."
                )
            print(f"imported PyTorch checkpoint {torch_checkpoint}")
        elif checkpoint_dir is not None:
            from coastline.train.trainer import TrainerConfig, WaterSegmentationTrainer

            trainer = WaterSegmentationTrainer(
                TrainerConfig(save_dir=checkpoint_dir, image_size=image_size)
            )
            payload = trainer.load_best(checkpoint_dir)
            if payload is None:
                raise FileNotFoundError(f"no best checkpoint under {checkpoint_dir}")
            self.variables = payload
            print(f"loaded model from {checkpoint_dir}")
        else:
            x = jnp.zeros((1, image_size, image_size, 3))
            v = self.model.init(
                {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x
            )
            self.variables = {"params": v["params"], "batch_stats": v["batch_stats"]}
            print("WARNING: no checkpoint provided — using random weights")

        # One-time device placement. The torch-import and Orbax paths hand
        # back host (numpy) trees; leaving them host-resident re-uploads
        # ~120 MB of f32 params through the ~30 ms-RTT tunnel on EVERY
        # jitted dispatch — the exact bug class the QuantizedModel path
        # fixed (quant.py: 5.8x slower scene serving before its
        # device_put). device_put is a no-op for already-committed
        # (incl. mesh-sharded) arrays.
        self.variables = jax.device_put(self.variables)

        def _logits(predict_params, x):
            params, batch_stats = predict_params
            return self.model.apply(
                {"params": params, "batch_stats": batch_stats}, x, train=False
            )

        _predict = _make_predict_fn(_logits, tta=self.tta)

        # uniform serving protocol: _predict_fn(predict_params, x_u8),
        # where predict_params is ALWAYS an argument (never a captured
        # device tree — those become HLO constants and hang remote
        # compiles when a larger program, e.g. the device scene pipeline,
        # traces through this fn)
        self._predict_fn = _predict
        self._predict_params = lambda: (
            self.variables["params"], self.variables["batch_stats"])
        self._scene_cache = {}

    def quantize(self, calib_images_u8: Optional[np.ndarray] = None,
                 batch_size: int = 2, save_to: Optional[str] = None):
        """Switch the predict path to int8 PTQ (infer/quant.py).

        Halves activation HBM traffic and runs the deep convs on the MXU's
        int8 path — a deployment speed mode the fp32-torch reference has no
        analogue of. `calib_images_u8` is (N, image_size, image_size, 3)
        uint8 representative data; defaults to synthetic coastal scenes.
        `save_to` additionally writes the quantized weights+scales as one
        .npz (infer/deploy.py) that `from_quantized` serves without the
        float checkpoint or calibration data.
        Returns self. Downstream artifacts are identical in structure; mask
        accuracy is gated in tests/test_quant.py + artifacts/quant_accuracy.json.
        """
        from coastline.infer.quant import QuantizedModel, default_calibration

        calib = default_calibration(self.image_size, calib_images_u8)
        qm = QuantizedModel.from_variables(
            self.variables, calib, batch_size=batch_size, arch="unet")
        if save_to is not None:
            from coastline.infer.deploy import save_quantized

            save_quantized(save_to, qm)
            print(f"saved quantized serving artifact: {save_to}")
        self._wire_quantized(qm)
        return self

    def _wire_quantized(self, qm) -> None:
        """Route the serving protocol through an int8 QuantizedModel."""
        from coastline.infer.quant import int8_forward

        self.quantized = qm

        def _logits_q(qparams, x):
            return int8_forward(qparams, qm.scales, x, arch=qm.arch,
                                policy=qm.policy)

        self._predict_fn = _make_predict_fn(
            _logits_q, tta=getattr(self, "tta", False))
        self._predict_params = lambda: qm.qparams
        self._scene_cache = {}  # scene programs trace _predict_fn; rebuild

    @classmethod
    def from_quantized(cls, npz_path: str, image_size: int = 512,
                       tta: bool = False):
        """Serve directly from a `save_quantized` .npz — no float
        checkpoint, Python weights tree, or calibration data needed
        (the deployment-host path; see docs/QUANT.md)."""
        from coastline.infer.deploy import load_quantized

        qm = load_quantized(npz_path)
        if qm.arch != "unet":
            raise ValueError(
                f"{npz_path} holds a {qm.arch!r} quantized model; the "
                "extractor's 2-class argmax pipeline expects arch 'unet'")
        ex = cls.__new__(cls)
        ex.image_size = image_size
        ex.tta = tta
        ex.model = None  # no float model; the int8 graph is the server
        # kept for introspection; the quantized serving protocol never
        # reads them (_predict_params returns the int8 tree)
        ex.variables = {"params": None, "batch_stats": None}
        ex._wire_quantized(qm)
        print(f"loaded quantized serving artifact {npz_path}")
        return ex

    # ------------------------------------------------------------------ io
    def _load_image_meta(self, image_path: str):
        """Load an image plus its raster metadata (geotransform/projection
        when the source is a georeferenced TIF, else None)."""
        if image_path.lower().endswith((".tif", ".tiff")):
            from coastline.data.geotiff import load_tif_enhanced

            try:
                rgb, meta = load_tif_enhanced(image_path)
                return Image.fromarray(rgb), meta
            except Exception as e:
                print(f"TIF load failed {image_path}: {e}")
                return Image.new("RGB", (512, 512), (0, 0, 0)), None
        return Image.open(image_path).convert("RGB"), None

    def _load_image(self, image_path: str) -> Image.Image:
        return self._load_image_meta(image_path)[0]

    # ------------------------------------------------------------- predict
    def predict_mask(self, image: Image.Image) -> np.ndarray:
        """512^2 predict + NEAREST upsample to native size -> (H,W) uint8."""
        original_size = image.size  # (W, H)
        resized = image.resize((self.image_size, self.image_size), Image.BILINEAR)
        x = jnp.asarray(np.asarray(resized, np.uint8))[None]
        mask = np.asarray(self._predict_fn(self._predict_params(), x))[0]
        mask_img = Image.fromarray(mask).resize(original_size, Image.NEAREST)
        return np.asarray(mask_img, np.uint8)

    def predict_masks_batch_async(self, images_u8: np.ndarray):
        """Dispatch the batched forward and return DEVICE arrays (JAX async
        futures) — the non-blocking half of `predict_masks_batch`, used by
        `extract_batch` to overlap host artifact writes with the chip."""
        return self._predict_fn(self._predict_params(), jnp.asarray(images_u8))

    def predict_masks_batch(self, images_u8: np.ndarray) -> np.ndarray:
        """Batched (N,512,512,3) uint8 -> (N,512,512) masks, one device call."""
        return np.asarray(self.predict_masks_batch_async(images_u8))

    def predict_scene(self, scene_u8: np.ndarray, batch: int = 8,
                      overlap: Optional[int] = None,
                      device_pipeline: bool = True,
                      with_band: Optional[int] = None,
                      mesh=None):
        """Full-scene water mask at native resolution via the tile pipeline.

        Default seam overlap is tile/8 (64 px at the production 512 tile),
        scaling with `image_size` so small-tile extractors don't request
        an overlap as large as the tile itself.

        `device_pipeline=True` (default) runs tile → forward → stitch as
        ONE jitted program (infer/scene.py): the scene uploads once and
        the stitched mask downloads once, instead of per-chunk tile
        round-trips — bit-identical output (tested), one compile per
        scene geometry. `False` keeps the host tiling path.

        `with_band=<dilation_size>` additionally returns the coastline
        band (reference `predict_coastline.py:599-602`) as a second
        array; on the device pipeline it is computed INSIDE the scene
        program (Pallas dilation included), saving the mask download →
        re-upload round trip a separate `coastline_band` call pays.

        `mesh=<jax.sharding.Mesh>` shards each chunk's tile batch across
        the mesh's data axes (GSPMD) so one scene fans out over a pod
        slice; output is bit-identical to the single-device program
        (tested on a virtual mesh). The host tiling path ignores `mesh`.
        """
        if overlap is None:
            overlap = self.image_size // 8
        if device_pipeline:
            out = self._predict_scene_device(
                scene_u8, batch=batch, overlap=overlap, with_band=with_band,
                mesh=mesh)
            if with_band is not None:
                mask, band = out
                return np.asarray(mask), np.asarray(band)
            return np.asarray(out)

        from coastline.data.tiling import stitch_tiles, tile_scene  # host path

        tiles, grid = tile_scene(scene_u8, self.image_size, overlap)
        outs = []
        for i in range(0, tiles.shape[0], batch):
            chunk = tiles[i : i + batch]
            pad = batch - chunk.shape[0]
            if pad:  # pad to the one compiled batch shape (pad may exceed len)
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
            masks = self.predict_masks_batch(chunk)
            outs.append(masks[: batch - pad] if pad else masks)
        mask = stitch_tiles(np.concatenate(outs), grid)
        if with_band is not None:
            return mask, np.asarray(coastline_band(mask, with_band))
        return mask

    def _predict_scene_device(self, scene_u8: np.ndarray, batch: int = 8,
                              overlap: Optional[int] = None,
                              with_band: Optional[int] = None,
                              mesh=None):
        """Dispatch the one-program scene pipeline and return DEVICE arrays.

        JAX dispatch is asynchronous: the returned arrays are futures, so a
        caller can keep doing host work (decode the next scene, trace
        contours, write PNGs) while the chip uploads/computes/stitches this
        one — the lever `extract_scenes` uses to pipeline the per-year
        workflow. `predict_scene` wraps this with blocking `np.asarray`.
        """
        if overlap is None:
            overlap = self.image_size // 8
        from coastline.infer.scene import build_scene_fn

        h, w, c = scene_u8.shape
        # Key by device identity too: two meshes of identical shape over
        # DIFFERENT devices must not share a compiled program — its baked
        # NamedSharding would route outputs to the first mesh's chips.
        mesh_key = None if mesh is None else (
            tuple((a, int(mesh.shape[a])) for a in mesh.axis_names),
            tuple(d.id for d in mesh.devices.flat))
        key = (h, w, c, self.image_size, overlap, batch, with_band, mesh_key)
        fn = self._scene_cache.get(key)
        if fn is None:
            fn = build_scene_fn(self._predict_fn, h, w, c,
                                self.image_size, overlap, batch,
                                band_dilation=with_band, mesh=mesh)
            self._scene_cache[key] = fn
        return fn(self._predict_params(), jnp.asarray(scene_u8))

    # ------------------------------------------------------------- extract
    def extract_coastline_from_image(
        self, image_path: str, output_dir: Optional[str] = None,
        dilation_size: int = 5,
    ) -> Optional[dict]:
        try:
            image, meta = self._load_image_meta(image_path)
            water_mask = self.predict_mask(image)
            band = np.asarray(coastline_band(water_mask, dilation_size))
            coastlines = extract_contours(band)
            result = {
                "image_path": image_path,
                "image_size": list(image.size),
                "water_mask": water_mask,
                "coastline_mask": band,
                "coastlines": coastlines,
                "coastline_count": len(coastlines),
                "dilation_size": dilation_size,
                "extraction_time": str(datetime.now()),
            }
            if meta and meta.get("geo_transform"):
                result["geo_transform"] = list(meta["geo_transform"])
                result["projection"] = meta.get("projection")
            if output_dir:
                self.save_extraction_result(result, output_dir, image)
            return result
        except Exception as e:
            print(f"extraction failed for {image_path}: {e}")
            return None

    def save_extraction_result(self, result: dict, output_dir: str,
                               image: Optional[Image.Image] = None):
        os.makedirs(output_dir, exist_ok=True)
        base = os.path.splitext(os.path.basename(result["image_path"]))[0]
        Image.fromarray(result["water_mask"] * 255).save(
            os.path.join(output_dir, f"{base}_water_mask.png")
        )
        Image.fromarray(result["coastline_mask"] * 255).save(
            os.path.join(output_dir, f"{base}_coastline_mask.png")
        )
        payload = {
            "image_path": result["image_path"],
            "image_size": result["image_size"],
            "coastlines": result["coastlines"],
            "coastline_count": result["coastline_count"],
            "dilation_size": result.get("dilation_size", 5),
            "extraction_time": result["extraction_time"],
        }
        with open(os.path.join(output_dir, f"{base}_coastlines.json"), "w",
                  encoding="utf-8") as f:
            json.dump(payload, f, indent=2, ensure_ascii=False)
        if result.get("geo_transform"):
            # beyond-reference: world-coordinate shorelines (infer/geojson.py)
            from coastline.infer.geojson import coastlines_to_geojson

            gj = coastlines_to_geojson(
                result["coastlines"], result["geo_transform"],
                projection=result.get("projection"),
                properties={"image_path": result["image_path"],
                            "dilation_size": result.get("dilation_size", 5)},
            )
            if gj is not None:
                with open(os.path.join(output_dir, f"{base}_coastlines.geojson"),
                          "w", encoding="utf-8") as f:
                    json.dump(gj, f, indent=2, ensure_ascii=False)
        try:
            from coastline.report.coastsat_fig import create_analysis_figure

            create_analysis_figure(result, output_dir, image)
        except Exception as e:
            print("analysis figure failed:", e)
        print(f"results saved to {output_dir}")

    def serve(self, batch_size: int = 8, max_delay_ms: float = 5.0):
        """Micro-batching server over this extractor's jitted predict:
        concurrent callers submit single images, the chip sees fixed-shape
        batches (infer/server.py). Use as a context manager."""
        from coastline.infer.server import BatchedPredictor

        return BatchedPredictor(
            self.predict_masks_batch, batch_size=batch_size,
            image_size=self.image_size, max_delay_ms=max_delay_ms,
        )

    def extract_batch(self, image_paths: List[str], output_dir: str,
                      dilation_size: int = 5,
                      batch_size: int = 8) -> List[Optional[dict]]:
        """Directory-scale extraction with BATCHED forwards: images load
        one chunk at a time (O(batch_size) resident memory), resize to the
        model size, run through the jitted predict at the fixed batch
        shape (one compiled program), then each mask is restored to its
        native size for band/contour/save — identical artifacts to the
        per-image path, fewer device round-trips.

        Like `extract_scenes`, the loop is software-pipelined over JAX
        async dispatch: chunk N+1's forward is in flight on the device
        while the host writes chunk N's artifacts (contours, PNGs,
        analysis figures — the slow part on this 1-vCPU host)."""
        s = self.image_size
        results: List[Optional[dict]] = [None] * len(image_paths)
        inflight: List[tuple] = []  # (start, paths, loaded, metas, dev|exc)

        def _finish():
            start, chunk_paths, loaded, metas, dev = inflight.pop(0)
            try:
                preds = np.asarray(dev)
            except Exception as e:
                # match the per-image error contract: one device-side
                # failure degrades this chunk to Nones, the run continues
                print(f"batched forward failed for chunk at {start}: {e}")
                return
            for j, (p, image) in enumerate(zip(chunk_paths, loaded)):
                if image is None:
                    continue
                try:
                    mask = np.asarray(
                        Image.fromarray(preds[j]).resize(image.size, Image.NEAREST),
                        np.uint8,
                    )
                    band = np.asarray(coastline_band(mask, dilation_size))
                    coastlines = extract_contours(band)
                    result = {
                        "image_path": p,
                        "image_size": list(image.size),
                        "water_mask": mask,
                        "coastline_mask": band,
                        "coastlines": coastlines,
                        "coastline_count": len(coastlines),
                        "dilation_size": dilation_size,
                        "extraction_time": str(datetime.now()),
                    }
                    if metas[j] and metas[j].get("geo_transform"):
                        result["geo_transform"] = list(metas[j]["geo_transform"])
                        result["projection"] = metas[j].get("projection")
                    if output_dir:
                        self.save_extraction_result(result, output_dir, image)
                    results[start + j] = result
                except Exception as e:
                    print(f"extraction failed for {p}: {e}")

        for start in range(0, len(image_paths), batch_size):
            chunk_paths = image_paths[start : start + batch_size]
            # load only this chunk (O(batch_size) resident images)
            loaded: List[Optional[Image.Image]] = []
            metas: List[Optional[dict]] = []
            for p in chunk_paths:
                try:
                    im, meta = self._load_image_meta(p)
                    loaded.append(im)
                    metas.append(meta)
                except Exception as e:
                    print(f"load failed for {p}: {e}")
                    loaded.append(None)
                    metas.append(None)
            arr = np.zeros((batch_size, s, s, 3), np.uint8)
            for j, im in enumerate(loaded):
                if im is not None:
                    arr[j] = np.asarray(im.resize((s, s), Image.BILINEAR), np.uint8)
            try:
                # async dispatch: device futures, fetched in _finish
                dev = self.predict_masks_batch_async(arr)
                inflight.append((start, chunk_paths, loaded, metas, dev))
            except Exception as e:
                print(f"batched forward failed for chunk at {start}: {e}")
            while len(inflight) >= 2:  # double buffering
                _finish()
        while inflight:
            _finish()
        return results

    # ---------------------------------------------------- scene extraction
    def extract_scene(self, image_path: str, output_dir: Optional[str] = None,
                      dilation_size: int = 5, batch: int = 8,
                      ) -> Optional[dict]:
        """Native-resolution tiled extraction for one scene.

        One device program runs tile -> forward -> stitch -> coastline band
        (`infer.scene.build_scene_fn`); host work is contour tracing plus
        the same artifact set as the single-image path (masks, polylines
        JSON, analysis figure, GeoJSON when georeferenced) — masks are
        already at native scene resolution, no NEAREST restore. Same
        error contract as `extract_coastline_from_image`: None on failure.
        """
        out = self.extract_scenes([image_path], output_dir,
                                  dilation_size=dilation_size, batch=batch)
        return out[0]

    def extract_scenes(self, image_paths: List[str],
                       output_dir: Optional[str] = None,
                       dilation_size: int = 5, batch: int = 8,
                       pipeline_depth: int = 2) -> List[Optional[dict]]:
        """Software-pipelined multi-scene extraction (the per-year workflow).

        JAX dispatch is asynchronous, so the device arrays the scene
        program returns are futures: this loop dispatches scene N+1 BEFORE
        fetching scene N's results, overlapping the chip's upload/compute/
        stitch with the host's slow parts (TIF decode + enhancement,
        contour tracing, PNG/JSON/figure writes). With same-sized yearly
        scenes the compiled program is reused from `_scene_cache`, so
        steady state is one dispatch + one fetch per scene and the host
        never idles waiting for the device (measured on-chip:
        `artifacts/scene_pipeline.json`).

        `pipeline_depth` bounds how many scenes are in flight on the
        device at once (2 = classic double buffering; each scene holds its
        padded uint8 copy + mask/band in HBM while in flight).

        Per-scene error contract matches `extract_batch`: a failed load,
        dispatch, or save yields None for that scene and never aborts the
        run. Returns result dicts in input order.
        """
        results: List[Optional[dict]] = [None] * len(image_paths)
        inflight: List[tuple] = []  # (idx, path, image, meta, device_out)

        def _finish():
            idx, path, image, meta, dev = inflight.pop(0)
            try:
                mask = np.asarray(dev[0]).astype(np.uint8)
                band = np.asarray(dev[1]).astype(np.uint8)
                coastlines = extract_contours(band)
                result = {
                    "image_path": path,
                    "image_size": list(image.size),
                    "water_mask": mask,
                    "coastline_mask": band,
                    "coastlines": coastlines,
                    "coastline_count": len(coastlines),
                    "dilation_size": dilation_size,
                    "extraction_time": str(datetime.now()),
                }
                if meta and meta.get("geo_transform"):
                    result["geo_transform"] = list(meta["geo_transform"])
                    result["projection"] = meta.get("projection")
                if output_dir:
                    self.save_extraction_result(result, output_dir, image)
                results[idx] = result
            except Exception as e:
                print(f"extraction failed for {path}: {e}")

        depth = max(1, pipeline_depth)
        for idx, path in enumerate(image_paths):
            try:
                image, meta = self._load_image_meta(path)
                scene = np.asarray(image, np.uint8)
                dev = self._predict_scene_device(
                    scene, batch=batch, with_band=dilation_size)
                inflight.append((idx, path, image, meta, dev))
            except Exception as e:
                print(f"extraction failed for {path}: {e}")
            while len(inflight) >= depth:
                _finish()
        while inflight:
            _finish()
        return results
