"""Optional Tkinter GUI for coastline extraction.

Functional parity with the reference's `CoastlineGUI` + `ZoomableImageCanvas`
(`/root/reference/predict_coastline.py:34-253,848-1544`): model auto-load,
single/multi/folder selection, background-thread batch processing with a
progress bar, tabbed result viewer with wheel-zoom/drag-pan canvases, batch
save. Kept deliberately thin: ALL compute lives in
`coastline.infer.CoastlineExtractor` (device-side), and — unlike the
reference, whose worker thread mutates GUI state unguarded
(SURVEY.md §5.2) — results pass through a thread-safe queue drained on the
Tk main loop.

Headless environments: `python -m coastline.cli.predict` is the primary
interface; this module import-gates tkinter.
"""

import os
import queue
import sys
import threading


def main(argv=None):
    try:
        import tkinter as tk
        from tkinter import filedialog, messagebox, ttk
    except ImportError:
        print("tkinter unavailable — use `python -m coastline.cli.predict` instead")
        return 1

    from PIL import Image, ImageTk

    from coastline.infer.extract import CoastlineExtractor

    class ZoomCanvas(tk.Canvas):
        """Wheel-zoom (0.1-5x), drag-pan, double-click-reset image canvas."""

        def __init__(self, master, **kw):
            super().__init__(master, bg="#202020", **kw)
            self._img = None
            self._tk_img = None
            self._scale = 1.0
            self._off = [0, 0]
            self.bind("<MouseWheel>", self._wheel)
            self.bind("<Button-4>", lambda e: self._zoom(1.1, e))
            self.bind("<Button-5>", lambda e: self._zoom(1 / 1.1, e))
            self.bind("<ButtonPress-1>", self._start)
            self.bind("<B1-Motion>", self._drag)
            self.bind("<Double-Button-1>", lambda e: self.fit())

        def show(self, pil_image):
            self._img = pil_image
            self.fit()

        def fit(self):
            if self._img is None:
                return
            w = max(self.winfo_width(), 64)
            h = max(self.winfo_height(), 64)
            self._scale = min(w / self._img.width, h / self._img.height, 5.0)
            self._off = [0, 0]
            self._render()

        def _zoom(self, factor, _event=None):
            self._scale = min(5.0, max(0.1, self._scale * factor))
            self._render()

        def _wheel(self, e):
            self._zoom(1.1 if e.delta > 0 else 1 / 1.1, e)

        def _start(self, e):
            self._anchor = (e.x, e.y)

        def _drag(self, e):
            self._off[0] += e.x - self._anchor[0]
            self._off[1] += e.y - self._anchor[1]
            self._anchor = (e.x, e.y)
            self._render()

        def _render(self):
            if self._img is None:
                return
            size = (
                max(1, int(self._img.width * self._scale)),
                max(1, int(self._img.height * self._scale)),
            )
            self._tk_img = ImageTk.PhotoImage(self._img.resize(size))
            self.delete("all")
            self.create_image(
                self.winfo_width() // 2 + self._off[0],
                self.winfo_height() // 2 + self._off[1],
                image=self._tk_img,
            )

    class App:
        def __init__(self, root):
            self.root = root
            root.title("coastline — TPU coastline extraction")
            root.geometry("1100x750")
            self.queue = queue.Queue()
            self.paths = []
            self.results = []

            bar = ttk.Frame(root)
            bar.pack(fill="x", padx=6, pady=4)
            ttk.Button(bar, text="Images…", command=self.pick_images).pack(side="left")
            ttk.Button(bar, text="Folder…", command=self.pick_folder).pack(side="left")
            ttk.Button(bar, text="Run", command=self.run).pack(side="left", padx=8)
            ttk.Button(bar, text="Save all…", command=self.save_all).pack(side="left")
            self.dilation = tk.IntVar(value=20)  # GUI default (reference :870)
            ttk.Label(bar, text="dilation").pack(side="left", padx=(12, 2))
            ttk.Spinbox(bar, from_=1, to=60, textvariable=self.dilation,
                        width=4).pack(side="left")
            self.status = tk.StringVar(value="loading model…")
            ttk.Label(root, textvariable=self.status).pack(fill="x", padx=6)
            self.progress = ttk.Progressbar(root)
            self.progress.pack(fill="x", padx=6)

            tabs = ttk.Notebook(root)
            tabs.pack(fill="both", expand=True, padx=6, pady=4)
            self.canvases = {}
            for name in ("Input", "Water mask", "Coastline band", "Overlay"):
                c = ZoomCanvas(tabs)
                tabs.add(c, text=name)
                self.canvases[name] = c

            threading.Thread(target=self._load_model, daemon=True).start()
            root.after(100, self._poll)

        def _load_model(self):
            try:
                ckpt = "./models"
                self.extractor = (
                    CoastlineExtractor(checkpoint_dir=ckpt)
                    if os.path.isdir(os.path.join(ckpt, "best"))
                    else CoastlineExtractor()
                )
                self.queue.put(("status", "model ready"))
            except Exception as e:
                self.queue.put(("status", f"model load failed: {e}"))

        def pick_images(self):
            self.paths = list(
                filedialog.askopenfilenames(
                    filetypes=[("images", "*.png *.jpg *.jpeg *.tif *.tiff")]
                )
            )
            self.status.set(f"{len(self.paths)} image(s) selected")

        def pick_folder(self):
            folder = filedialog.askdirectory()
            if folder:
                exts = (".png", ".jpg", ".jpeg", ".tif", ".tiff")
                self.paths = [
                    os.path.join(folder, f)
                    for f in sorted(os.listdir(folder))
                    if f.lower().endswith(exts)
                ]
                self.status.set(f"{len(self.paths)} image(s) in folder")

        def run(self):
            if not self.paths:
                messagebox.showinfo("coastline", "select images first")
                return
            self.results = []
            self.progress.configure(maximum=len(self.paths), value=0)
            threading.Thread(target=self._worker, daemon=True).start()

        def _worker(self):
            for i, p in enumerate(self.paths):
                result = self.extractor.extract_coastline_from_image(
                    p, None, self.dilation.get()
                )
                self.queue.put(("result", (i, p, result)))
            self.queue.put(("done", None))

        def _poll(self):
            try:
                while True:
                    kind, payload = self.queue.get_nowait()
                    if kind == "status":
                        self.status.set(payload)
                    elif kind == "result":
                        i, p, result = payload
                        self.progress.configure(value=i + 1)
                        self.status.set(f"processed {i + 1}/{len(self.paths)}")
                        if result is not None:
                            self.results.append(result)
                            self._show(p, result)
                    elif kind == "done":
                        self.status.set(f"done — {len(self.results)} succeeded")
            except queue.Empty:
                pass
            self.root.after(100, self._poll)

        def _show(self, path, result):
            import numpy as np

            img = self.extractor._load_image(path)
            self.canvases["Input"].show(img)
            self.canvases["Water mask"].show(
                Image.fromarray(result["water_mask"] * 255)
            )
            self.canvases["Coastline band"].show(
                Image.fromarray(result["coastline_mask"] * 255)
            )
            overlay = np.asarray(img).copy()
            overlay[result["coastline_mask"] > 0] = (255, 0, 0)
            self.canvases["Overlay"].show(Image.fromarray(overlay))

        def save_all(self):
            if not self.results:
                return
            out = filedialog.askdirectory()
            if out:
                for r in self.results:
                    self.extractor.save_extraction_result(r, out)
                self.status.set(f"saved {len(self.results)} result set(s) to {out}")

    root = tk.Tk()
    App(root)
    root.mainloop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
