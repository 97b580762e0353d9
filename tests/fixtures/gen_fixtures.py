"""Generator for the committed Netlib-grade MPS fixtures (VERDICT r1 item 9).

Run once (python tests/fixtures/gen_fixtures.py) to regenerate the .mps
files next to this script; the outputs are committed so the test suite never
depends on the generator.  Each fixture is feasible and bounded by
construction and exercises, at Netlib-realistic density (hundreds of rows):

  * all row types (N/L/G/E) with RANGES records on L, G, AND E rows,
    including a negative range value on an E row (the asymmetric-interval
    convention);
  * the full bounds vocabulary: LO, UP, FX, FR, MI, PL, negative-UP with no
    prior LO (the netlib convention that implies lb = -inf);
  * an RHS entry on the objective row (constant term, negated by
    convention);
  * repeated column blocks (a column's entries split across separate
    COLUMNS lines), comment lines, and an OBJSENSE MAX variant.
"""
from __future__ import annotations

import os

import numpy as np


def _fmt(v: float) -> str:
    return f"{v:.10g}"


def make_fixture(seed: int, m_l: int, m_g: int, m_e: int, nb: int,
                 n_free: int, maximize: bool = False,
                 obj_rhs: float = 0.0) -> str:
    rng = np.random.default_rng(seed)
    n = nb + n_free
    m = m_l + m_g + m_e + n_free          # + one pin row per free var

    # bounded variables: assorted bound records
    lb = np.zeros(nb)
    ub = np.full(nb, np.inf)
    bound_lines: list[str] = []
    kinds = rng.choice(
        ["default", "up", "lo_up", "neg_up", "fx", "mi_up", "lo", "pl"],
        size=nb, p=[0.25, 0.2, 0.15, 0.08, 0.07, 0.1, 0.1, 0.05])
    for j, k in enumerate(kinds):
        name = f"X{j:04d}"
        if k == "up":
            ub[j] = rng.uniform(1.0, 8.0)
            bound_lines.append(f" UP BND       {name}  {_fmt(ub[j])}")
        elif k == "lo_up":
            lb[j] = rng.uniform(-4.0, 0.0)
            ub[j] = lb[j] + rng.uniform(1.0, 8.0)
            bound_lines.append(f" LO BND       {name}  {_fmt(lb[j])}")
            bound_lines.append(f" UP BND       {name}  {_fmt(ub[j])}")
        elif k == "neg_up":
            # netlib convention: UP with negative value, no LO -> lb = -inf
            ub[j] = rng.uniform(-3.0, -0.5)
            lb[j] = -np.inf
            bound_lines.append(f" UP BND       {name}  {_fmt(ub[j])}")
        elif k == "fx":
            lb[j] = ub[j] = rng.uniform(-2.0, 2.0)
            bound_lines.append(f" FX BND       {name}  {_fmt(lb[j])}")
        elif k == "mi_up":
            lb[j] = -np.inf
            ub[j] = rng.uniform(0.5, 5.0)
            bound_lines.append(f" MI BND       {name}")
            bound_lines.append(f" UP BND       {name}  {_fmt(ub[j])}")
        elif k == "lo":
            lb[j] = rng.uniform(-3.0, 1.0)
            bound_lines.append(f" LO BND       {name}  {_fmt(lb[j])}")
        elif k == "pl":
            bound_lines.append(f" PL BND       {name}")
        # "default": [0, inf), no record

    # interior point for feasibility; unbounded-below vars pinned to finite
    lo_f = np.where(np.isfinite(lb), lb, np.minimum(ub, 0.0) - 3.0)
    hi_f = np.where(np.isfinite(ub), ub, lo_f + 6.0)
    x0b = lo_f + (hi_f - lo_f) * rng.uniform(0.25, 0.75, nb)

    # sparse-ish constraint rows over the bounded vars
    def sparse_rows(mm):
        R = np.zeros((mm, nb))
        for i in range(mm):
            k = rng.integers(4, 9)
            cols = rng.choice(nb, size=k, replace=False)
            R[i, cols] = np.round(rng.standard_normal(k) * 2, 4)
        return R

    A_l, A_g, A_e = sparse_rows(m_l), sparse_rows(m_g), sparse_rows(m_e)
    b_l = A_l @ x0b + rng.uniform(0.5, 4.0, m_l)
    b_g = A_g @ x0b - rng.uniform(0.5, 4.0, m_g)
    b_e = A_e @ x0b

    # free variables, each pinned by one equality  F_k - a @ x_b = r_k
    pin = np.round(rng.standard_normal((n_free, nb)), 4)
    r_pin = np.round(rng.standard_normal(n_free), 4)

    rows = []
    row_names = []
    for i in range(m_l):
        rows.append(("L", f"RL{i:04d}")); row_names.append(f"RL{i:04d}")
    for i in range(m_g):
        rows.append(("G", f"RG{i:04d}")); row_names.append(f"RG{i:04d}")
    for i in range(m_e):
        rows.append(("E", f"RE{i:04d}")); row_names.append(f"RE{i:04d}")
    for k in range(n_free):
        rows.append(("E", f"RP{k:04d}")); row_names.append(f"RP{k:04d}")

    c = np.round(rng.standard_normal(n), 4)

    lines = [f"* Netlib-grade synthetic fixture seed={seed}",
             f"* {m} constraint rows, {n} columns",
             f"NAME          SYN{seed:02d}"]
    if maximize:
        lines += ["OBJSENSE", "    MAX"]
    lines.append("ROWS")
    lines.append(" N  COST")
    for t, name in rows:
        lines.append(f" {t}  {name}")

    lines.append("COLUMNS")
    # bounded columns: objective + their L/G/E entries (two pairs per line
    # where possible, netlib style); split across repeated blocks sometimes
    col_entries: dict[str, list[tuple[str, float]]] = {}
    for j in range(nb):
        name = f"X{j:04d}"
        ent = [("COST", c[j])] if c[j] != 0 else []
        for (Ar, prefix) in ((A_l, "RL"), (A_g, "RG"), (A_e, "RE")):
            for i in np.flatnonzero(Ar[:, j]):
                ent.append((f"{prefix}{i:04d}", Ar[i, j]))
        for k in np.flatnonzero(pin[:, j]):
            ent.append((f"RP{k:04d}", -pin[k, j]))
        col_entries[name] = ent
    for k in range(n_free):
        name = f"F{k:04d}"
        ent = [("COST", c[nb + k])] if c[nb + k] != 0 else []
        ent.append((f"RP{k:04d}", 1.0))
        col_entries[name] = ent

    for name, ent in col_entries.items():
        i = 0
        while i < len(ent):
            chunk = ent[i:i + 2]
            parts = "  ".join(f"{r}  {_fmt(v)}" for r, v in chunk)
            lines.append(f"    {name}  {parts}")
            i += 2

    lines.append("RHS")
    if obj_rhs != 0.0:
        lines.append(f"    RHS       COST  {_fmt(obj_rhs)}")
    rhs_vals = list(zip([f"RL{i:04d}" for i in range(m_l)], b_l)) \
        + list(zip([f"RG{i:04d}" for i in range(m_g)], b_g)) \
        + list(zip([f"RE{i:04d}" for i in range(m_e)], b_e)) \
        + list(zip([f"RP{k:04d}" for k in range(n_free)], r_pin))
    i = 0
    while i < len(rhs_vals):
        chunk = rhs_vals[i:i + 2]
        parts = "  ".join(f"{r}  {_fmt(v)}" for r, v in chunk)
        lines.append(f"    RHS       {parts}")
        i += 2

    # RANGES on every row type, incl. a NEGATIVE range on an E row
    lines.append("RANGES")
    if m_l >= 2:
        lines.append(f"    RNG       RL0000  {_fmt(2.5)}  "
                     f"RL0001  {_fmt(1.25)}")
    if m_g >= 1:
        lines.append(f"    RNG       RG0000  {_fmt(3.0)}")
    if m_e >= 2:
        lines.append(f"    RNG       RE0000  {_fmt(1.5)}  "
                     f"RE0001  {_fmt(-2.0)}")

    lines.append("BOUNDS")
    lines.extend(bound_lines)
    for k in range(n_free):
        lines.append(f" FR BND       F{k:04d}")
    lines.append("ENDATA")
    return "\n".join(lines) + "\n"


def main() -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    specs = [
        ("syn01.mps", dict(seed=1, m_l=60, m_g=50, m_e=40, nb=90, n_free=4,
                           obj_rhs=-25.0)),
        ("syn02.mps", dict(seed=2, m_l=120, m_g=80, m_e=60, nb=160,
                           n_free=6)),
        ("syn03_max.mps", dict(seed=3, m_l=70, m_g=40, m_e=30, nb=100,
                               n_free=3, maximize=True, obj_rhs=10.0)),
    ]
    for fname, kw in specs:
        txt = make_fixture(**kw)
        with open(os.path.join(here, fname), "w") as f:
            f.write(txt)
        print(fname, len(txt.splitlines()), "lines")


if __name__ == "__main__":
    main()
