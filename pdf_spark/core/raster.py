"""Scanline polygon rasterizer — the canvas-sink tier, text-engine sized.

Closes SURVEY §2.3 #37 at the level this engine can certify: the reference
rasterizes via a y-monotone DCEL tessellation + canvas
(``libs/canvas/src/canvas.c:18-280``, ``dcel.c``, 2,427 LoC) because its
sink is pixels; our sink is text/spans, so the raster tier exists for
layout features (ink maps, glyph coverage, visual-dedup thumbnails over
span geometry). This is a classic even-odd / nonzero-winding scanline
fill, sampled at pixel centers ``(px+0.5, py+0.5)``:

- each polygon edge contributes a crossing on scanline y iff it spans the
  sample ordinate (half-open ``[y_lo, y_hi)`` so shared vertices count
  once — the standard top-left style rule);
- crossings accumulate signed winding (nonzero) or parity (even-odd),
  and spans between sorted crossings fill whole pixel runs.

Axis-aligned integer rectangles rasterize EXACTLY (``(x1-x0)*(y1-y0)``
pixels), which is what the DuckDB oracle of ``qx73_page_raster`` checks;
arbitrary polygons are fuzz-tested against a brute-force point-in-polygon
count in unit tests.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

Point = Tuple[float, float]

_MAX_DIM = 4096


def rasterize(
    contours: Sequence[Sequence[Point]],
    width: int,
    height: int,
    rule: str = "nonzero",
) -> bytearray:
    """Fill closed ``contours`` into a ``width*height`` 0/1 bitmap."""
    if not 0 < width <= _MAX_DIM or not 0 < height <= _MAX_DIM:
        raise ValueError("raster dimensions")
    if rule not in ("nonzero", "evenodd"):
        raise ValueError("fill rule")
    bitmap = bytearray(width * height)
    # edge list: (y_lo, y_hi, x_at_ylo, dx/dy, direction)
    edges = []
    for contour in contours:
        n = len(contour)
        if n < 2:
            continue
        for k in range(n):
            x0, y0 = contour[k]
            x1, y1 = contour[(k + 1) % n]
            if y0 == y1:
                continue  # horizontal edges never cross a scanline sample
            if y0 < y1:
                edges.append((y0, y1, x0, (x1 - x0) / (y1 - y0), 1))
            else:
                edges.append((y1, y0, x1, (x0 - x1) / (y0 - y1), -1))
    if not edges:
        return bitmap

    y_min = max(0, int(min(e[0] for e in edges)))
    y_max = min(height, int(max(e[1] for e in edges)) + 1)
    for py in range(y_min, y_max):
        sy = py + 0.5
        crossings: List[Tuple[float, int]] = []
        for y_lo, y_hi, x_lo, slope, direction in edges:
            if y_lo <= sy < y_hi:
                crossings.append((x_lo + (sy - y_lo) * slope, direction))
        if not crossings:
            continue
        crossings.sort()
        row = py * width
        if rule == "nonzero":
            winding = 0
            span_start = 0.0
            for x, direction in crossings:
                prev = winding
                winding += direction
                if prev == 0 and winding != 0:
                    span_start = x
                elif prev != 0 and winding == 0:
                    _fill_run(bitmap, row, span_start, x, width)
        else:
            inside = False
            span_start = 0.0
            for x, _ in crossings:
                if inside:
                    _fill_run(bitmap, row, span_start, x, width)
                else:
                    span_start = x
                inside = not inside
    return bitmap


def _fill_run(
    bitmap: bytearray, row: int, x_start: float, x_end: float, width: int
) -> None:
    # pixel centers px+0.5 inside [x_start, x_end): px >= ceil(x_start-0.5)
    lo = max(math.ceil(x_start - 0.5), 0)
    hi = min(math.ceil(x_end - 0.5), width)  # exclusive
    for px in range(lo, hi):
        bitmap[row + px] = 1


def ink_stats(bitmap: bytearray, width: int, height: int) -> dict:
    """Summaries the oracle can reproduce: counts + touched-row extent."""
    total = 0
    first_row = -1
    last_row = -1
    rows_touched = 0
    for py in range(height):
        row_ink = sum(bitmap[py * width:(py + 1) * width])
        if row_ink:
            total += row_ink
            rows_touched += 1
            if first_row < 0:
                first_row = py
            last_row = py
    return {
        "ink": total,
        "rows_touched": rows_touched,
        "first_row": first_row,
        "last_row": last_row,
    }


def rect(x0: float, y0: float, w: float, h: float,
         reverse: bool = False) -> List[Point]:
    """Axis-aligned rectangle contour (ccw; ``reverse`` for holes)."""
    pts = [(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h)]
    return pts[::-1] if reverse else pts
