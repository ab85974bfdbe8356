#!/usr/bin/env python3
"""Ops-per-point roofline for the grid MSM (VERDICT r2 weak #2).

Counts the EXACT uint32 VPU ops per mixed point add by tracing the
kernel's own field/point code (``curve/limb15.py``, ``msm/grid.py``)
with an operator-counting array shim — no hand-derived formulas — then
converts a measured MSM pts/s into achieved VPU ops/s and reports it as
a fraction of the chip's nominal vector ceiling.

Model:
- prefix kernel work = one ``_pmadd`` per lane per grid step; a c-bit
  window decomposition of 254-bit scalars gives ceil(254/c) window
  planes, i.e. ops/point ~= n_windows * ops(_pmadd)  (bucket fold +
  window combine are O(2^c * windows) point ops, amortized < 2% at
  2^20 and counted separately below).
- ceiling = 1024 VPU lanes x 4 ALUs x 940 MHz (TPU v5e nominal); int32
  multiply may retire below 1 op/ALU/cycle on the VPU, so "% of
  ceiling" is a LOWER bound on how well the kernel uses the hardware.

Usage: python scripts/roofline.py [measured_pts_per_s] [log2n]
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np


class CountingArray:
    """Stands in for a jnp array inside the limb routines; records every
    arithmetic/logic op that would hit the VPU. Comparisons, selects and
    zeros_like/full_like count too (they are real vector ops)."""

    COUNTS = {}

    @classmethod
    def reset(cls):
        cls.COUNTS = {"mul": 0, "add": 0, "sub": 0, "and": 0, "shift": 0,
                      "or": 0, "select": 0, "cmp": 0, "invert": 0}

    @classmethod
    def _n(cls, kind):
        cls.COUNTS[kind] = cls.COUNTS.get(kind, 0) + 1
        return cls()

    def __mul__(self, o): return self._n("mul")
    __rmul__ = __mul__
    def __add__(self, o): return self._n("add")
    __radd__ = __add__
    def __sub__(self, o): return self._n("sub")
    __rsub__ = __sub__
    def __and__(self, o): return self._n("and")
    __rand__ = __and__
    def __or__(self, o): return self._n("or")
    __ror__ = __or__
    def __rshift__(self, o): return self._n("shift")
    def __lshift__(self, o): return self._n("shift")
    def __eq__(self, o): return self._n("cmp")
    def __ne__(self, o): return self._n("cmp")
    def __invert__(self): return self._n("invert")
    def __hash__(self):
        return id(self)


def _patch_jnp(monkey):
    import tpu_zkpool.curve.limb15 as l15
    jnp_like = type("jnp", (), {})()
    jnp_like.zeros_like = lambda x: CountingArray()
    jnp_like.full_like = lambda x, v: CountingArray()
    jnp_like.where = lambda c, a, b: CountingArray._n("select")
    monkey.setattr(l15, "jnp", jnp_like)
    return l15


def count(fn_name, *args_builders):
    """Run one limb15/grid routine over CountingArrays; return op dict."""
    import unittest.mock as mock
    with mock.patch("tpu_zkpool.curve.limb15.jnp") as jnp_like:
        jnp_like.zeros_like = lambda x: CountingArray()
        jnp_like.full_like = lambda x, v: CountingArray()
        jnp_like.where = lambda c, a, b: CountingArray._n("select")
        import tpu_zkpool.curve.limb15 as l15
        import tpu_zkpool.msm.grid as grid
        CountingArray.reset()
        elt = lambda: [CountingArray() for _ in range(l15.NL)]
        point_jac = lambda: ([elt()], [elt()], [elt()])
        point_aff = lambda: ([elt()], [elt()])
        if fn_name == "mul15":
            l15.mul15(elt(), elt())
        elif fn_name == "sqr15":
            l15.sqr15(elt())
        elif fn_name == "add15":
            l15.add15(elt(), elt())
        elif fn_name == "sub15":
            l15.sub15(elt(), elt())
        elif fn_name == "mul_sub15":
            l15.mul_sub15(elt(), elt(), elt(), elt())
        elif fn_name == "pmadd":
            grid._pmadd(l15.L15Fp, point_jac(), point_aff(), complete=False)
        elif fn_name == "pmadd_complete":
            grid._pmadd(l15.L15Fp, point_jac(), point_aff(), complete=True)
        elif fn_name == "pdouble":
            grid._pdouble(l15.L15Fp, point_jac())
        elif fn_name == "padd":
            grid._padd(l15.L15Fp, point_jac(), point_jac(), complete=False)
        else:
            raise ValueError(fn_name)
        return dict(CountingArray.COUNTS)


def total(c):
    return sum(c.values())


def main():
    pts_per_s = float(sys.argv[1]) if len(sys.argv) > 1 else 3.48e6
    log2n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    cbits = 13
    n_windows = -(-254 // cbits)          # 20 at c=13
    n = 1 << log2n

    rows = []
    for name in ("mul15", "sqr15", "add15", "sub15", "mul_sub15",
                 "pmadd", "pmadd_complete", "padd", "pdouble"):
        ops = count(name)
        rows.append((name, ops))

    print("| routine | mul | add/sub | and/shift | select/cmp | total VPU ops |")
    print("|---|---|---|---|---|---|")
    by = {}
    for name, o in rows:
        by[name] = o
        print(f"| {name} | {o['mul']} | {o['add'] + o['sub']} | "
              f"{o['and'] + o['shift'] + o['or']} | "
              f"{o['select'] + o['cmp'] + o['invert']} | {total(o)} |")

    pm = total(by["pmadd"])
    # bucket fold + window combine: ~2 * 2^c general adds per window plane
    # plus ~c doublings per combine step — O(windows * 2^c) point ops.
    fold_ops = n_windows * 2 * (1 << cbits) * total(by["padd"])
    per_point = n_windows * pm + fold_ops / n
    achieved = pts_per_s * per_point
    lanes, alus, clock = 1024, 4, 0.94e9
    ceiling = lanes * alus * clock
    print()
    print(f"ops per _pmadd (prover mode): {pm}")
    print(f"windows (c={cbits}, 254-bit): {n_windows}")
    print(f"fold amortization at 2^{log2n}: {fold_ops / n:.0f} ops/pt "
          f"({100 * (fold_ops / n) / per_point:.1f}%)")
    print(f"VPU ops per point: {per_point:,.0f}")
    print(f"measured {pts_per_s:,.0f} pts/s -> {achieved:.3e} VPU ops/s")
    print(f"nominal ceiling ({lanes} lanes x {alus} ALUs x {clock/1e9:.2f} GHz):"
          f" {ceiling:.3e} ops/s")
    print(f"fraction of ceiling: {100 * achieved / ceiling:.1f}%")


if __name__ == "__main__":
    main()
