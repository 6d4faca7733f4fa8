"""Search alternative gradient placements / wider starts for the
6MN5F3GP structure (tools/derive_mn6_schemes.py found no roots with
gradients on the outer kick pair + middle at span 1.2).

A '5F3G position' palindrome T(a1) K(b1) T(a2) K(b2) T(a3) K(b3)
T(a3) K(b2) T(a2) K(b1) T(a1) has kick slots (b1, b2, b3); "3
gradients" can sit on {b1, b3} (outer pair + middle: x1 x1 x3 — the
original attempt), {b2, b3} (inner pair + middle), or all three with
a tied parameter.  Each placement leaves exactly 6 free parameters.

Run:  python tools/derive_6mn5f3gp_alt.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

from derive_mn6_schemes import derive_fast  # noqa: E402


def s_inner(p):
    """Gradients on the inner kick pair + middle: V FG FG FG V."""
    a1, a2, b1, b2, x2, x3 = p
    a3 = 0.5 - a1 - a2
    b3 = 1.0 - 2.0 * (b1 + b2)
    return [("T", a1), ("V", b1), ("T", a2), ("FG", b2, x2), ("T", a3),
            ("FG", b3, x3), ("T", a3), ("FG", b2, x2), ("T", a2),
            ("V", b1), ("T", a1)]


def s_outer_wide(p):
    """Original placement (outer pair + middle), re-searched wider."""
    a1, a2, b1, b2, x1, x3 = p
    a3 = 0.5 - a1 - a2
    b3 = 1.0 - 2.0 * (b1 + b2)
    return [("T", a1), ("FG", b1, x1), ("T", a2), ("V", b2), ("T", a3),
            ("FG", b3, x3), ("T", a3), ("V", b2), ("T", a2),
            ("FG", b1, x1), ("T", a1)]


if __name__ == "__main__":
    derive_fast("6MN5F3GP-inner", s_inner, nstart=300, span=1.6, seed=11)
    derive_fast("6MN5F3GP-outer-wide", s_outer_wide, nstart=300,
                span=2.0, seed=13)
