"""Render the first N stencil points to an SVG scatter (offline tool).

Parity with the reference's visualization tool
(``/root/reference/tools/stencilgif.py:51-108``, which renders a GIF of the
growing stencil via gizeh/moviepy).  This container has no imaging
libraries, so the equivalent here is dependency-free SVG: points of the
2-D stencil colored by resolution level (``extra_halvings``), origin
marked, lattice-accurate coordinates.

Usage: python tools/stencilsvg.py [n_points] [out.svg]
"""

from __future__ import annotations

import os
import sys
from itertools import islice

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dask_patternsearch_spark.stencil import SimplexStencil  # noqa: E402

# resolution level -> fill color (doubled steps warm, contractions cool)
_COLORS = {
    -1: "#d62728",  # doubled (halvings credited back)
    0: "#1f77b4",   # base resolution (includes the poll set)
    1: "#2ca02c",
    2: "#9467bd",
    3: "#8c564b",
}
_DEFAULT_COLOR = "#7f7f7f"


def stencil_svg(n_points: int = 120, dims: int = 2, max_halvings: int = 7) -> str:
    """The first ``n_points`` stencil steps as an SVG document string."""
    steps = list(islice(SimplexStencil(dims, max_halvings).steps(), n_points))
    xs = [s.offset[0] for s in steps]
    ys = [s.offset[1] for s in steps]
    span = max(max(map(abs, xs + ys)), 1.0) * 1.15
    size = 640

    def px(v: float) -> float:
        return round((v / span) * (size / 2 - 10) + size / 2, 2)

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{size}" height="{size}" '
        f'viewBox="0 0 {size} {size}">',
        f'<rect width="{size}" height="{size}" fill="white"/>',
        # axes through the origin
        f'<line x1="0" y1="{size/2}" x2="{size}" y2="{size/2}" stroke="#ddd"/>',
        f'<line x1="{size/2}" y1="0" x2="{size/2}" y2="{size}" stroke="#ddd"/>',
    ]
    for i, s in enumerate(steps):
        color = _COLORS.get(s.extra_halvings, _DEFAULT_COLOR)
        r = 6.0 if i < 2 * dims else 3.5  # poll set drawn larger
        parts.append(
            f'<circle cx="{px(s.offset[0])}" cy="{px(-s.offset[1])}" r="{r}" '
            f'fill="{color}" fill-opacity="0.8">'
            f"<title>#{i + 1} offset=({s.offset[0]:g},{s.offset[1]:g}) "
            f"extra_halvings={s.extra_halvings}</title></circle>"
        )
    # origin marker
    parts.append(
        f'<circle cx="{size/2}" cy="{size/2}" r="4" fill="black"/>'
    )
    parts.append("</svg>")
    return "\n".join(parts)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    out = sys.argv[2] if len(sys.argv) > 2 else "stencil.svg"
    svg = stencil_svg(n)
    with open(out, "w") as f:
        f.write(svg)
    print(f"wrote {out} ({n} points)")


if __name__ == "__main__":
    main()
