"""MPS file reader (SURVEY.md component N3; BASELINE.json config 2).

Host-side, pure Python — parses the (free-format) MPS dialect used by the
Netlib LP collection into a :class:`ipx.problem.lp.GeneralLP`.  Supported
sections: NAME, OBJSENSE, ROWS (N/L/G/E), COLUMNS, RHS, RANGES, BOUNDS
(LO/UP/FX/FR/MI/PL/BV/LI/UI).  Integer markers raise (LP solver only).
"""
from __future__ import annotations

import numpy as np

from ipx.problem.lp import GeneralLP


class MPSError(ValueError):
    pass


def read_mps_string(text: str) -> GeneralLP:
    """Parse MPS text into a GeneralLP (free-format, whitespace-separated)."""
    name = ""
    maximize = False
    section = None
    obj_row = None
    row_types: dict[str, str] = {}
    row_order: list[str] = []
    # per-column coefficient dicts
    cols: dict[str, dict[str, float]] = {}
    col_order: list[str] = []
    rhs: dict[str, float] = {}
    ranges: dict[str, float] = {}
    lb: dict[str, float] = {}
    ub: dict[str, float] = {}
    free_vars: set[str] = set()

    lines = text.splitlines()
    i = 0
    while i < len(lines):
        raw = lines[i]
        i += 1
        if not raw.strip() or raw.lstrip().startswith("*"):
            continue
        is_header = raw[0] not in " \t"
        tok = raw.split()
        if is_header:
            head = tok[0].upper()
            if head == "NAME":
                name = tok[1] if len(tok) > 1 else ""
                section = "NAME"
            elif head == "OBJSENSE":
                section = "OBJSENSE"
                if len(tok) > 1:
                    maximize = tok[1].upper().startswith("MAX")
            elif head in ("ROWS", "COLUMNS", "RHS", "RANGES", "BOUNDS"):
                section = head
            elif head == "ENDATA":
                break
            else:
                raise MPSError(f"unknown MPS section {head!r}")
            continue

        if section == "OBJSENSE":
            maximize = tok[0].upper().startswith("MAX")
        elif section == "ROWS":
            rt, rname = tok[0].upper(), tok[1]
            if rt not in ("N", "L", "G", "E"):
                raise MPSError(f"bad row type {rt!r}")
            if rt == "N":
                if obj_row is None:
                    obj_row = rname
                # extra N rows are free rows — ignored
            else:
                row_types[rname] = rt
                row_order.append(rname)
        elif section == "COLUMNS":
            if len(tok) >= 3 and tok[1].upper() == "'MARKER'":
                if any("INTORG" in t.upper() for t in tok):
                    raise MPSError("integer variables not supported (LP only)")
                continue
            cname = tok[0]
            if cname not in cols:
                cols[cname] = {}
                col_order.append(cname)
            pairs = tok[1:]
            if len(pairs) % 2:
                raise MPSError(f"odd COLUMNS entry: {raw!r}")
            for r, v in zip(pairs[::2], pairs[1::2]):
                cols[cname][r] = cols[cname].get(r, 0.0) + float(v)
        elif section == "RHS":
            pairs = tok[1:] if len(tok) % 2 else tok  # rhs-set name optional
            if len(pairs) % 2:
                pairs = tok[1:]
            for r, v in zip(pairs[::2], pairs[1::2]):
                rhs[r] = float(v)
        elif section == "RANGES":
            pairs = tok[1:] if len(tok) % 2 else tok
            if len(pairs) % 2:
                pairs = tok[1:]
            for r, v in zip(pairs[::2], pairs[1::2]):
                ranges[r] = float(v)
        elif section == "BOUNDS":
            bt = tok[0].upper()
            # "BT setname col [val]" — set name present in netlib files
            if bt in ("LO", "UP", "FX", "LI", "UI"):
                if len(tok) < 4:
                    raise MPSError(f"bad bound line: {raw!r}")
                cname, val = tok[2], float(tok[3])
            elif bt in ("FR", "MI", "PL", "BV"):
                cname, val = tok[2], 0.0
            else:
                raise MPSError(f"bad bound type {bt!r}")
            if bt in ("LO", "LI"):
                lb[cname] = val
            elif bt in ("UP", "UI"):
                ub[cname] = val
                # netlib convention: UP with negative value and no explicit
                # lower bound implies lb = -inf
                if val < 0 and cname not in lb:
                    lb[cname] = -np.inf
            elif bt == "FX":
                lb[cname] = val
                ub[cname] = val
            elif bt == "FR":
                free_vars.add(cname)
            elif bt == "MI":
                lb[cname] = -np.inf
            elif bt == "PL":
                ub[cname] = np.inf
            elif bt == "BV":
                raise MPSError("binary variables not supported (LP only)")
        elif section in ("NAME", None):
            continue
        else:
            raise MPSError(f"data line outside a section: {raw!r}")

    if obj_row is None:
        raise MPSError("no objective (N) row")

    n = len(col_order)
    m = len(row_order)
    cidx = {cname: j for j, cname in enumerate(col_order)}
    ridx = {r: i for i, r in enumerate(row_order)}

    c = np.zeros(n)
    A = np.zeros((m, n))
    for cname, entries in cols.items():
        j = cidx[cname]
        for r, v in entries.items():
            if r == obj_row:
                c[j] = v
            elif r in ridx:
                A[ridx[r], j] = v
            # coefficients in ignored free rows are dropped

    b = np.array([rhs.get(r, 0.0) for r in row_order])

    # Build constraint form: E rows -> equalities (or range rows),
    # L rows: ax <= b (range adds lower), G rows: ax >= b.
    A_ub_rows, b_ub = [], []
    A_eq_rows, b_eq = [], []
    for r in row_order:
        i_ = ridx[r]
        t = row_types[r]
        rv = ranges.get(r)
        if rv is None:
            if t == "E":
                A_eq_rows.append(A[i_]); b_eq.append(b[i_])
            elif t == "L":
                A_ub_rows.append(A[i_]); b_ub.append(b[i_])
            else:  # G
                A_ub_rows.append(-A[i_]); b_ub.append(-b[i_])
        else:
            # RANGES: row becomes  lo <= ax <= hi  (MPS range semantics)
            if t == "L":
                hi, lo = b[i_], b[i_] - abs(rv)
            elif t == "G":
                lo, hi = b[i_], b[i_] + abs(rv)
            else:  # E
                if rv >= 0:
                    lo, hi = b[i_], b[i_] + rv
                else:
                    lo, hi = b[i_] + rv, b[i_]
            A_ub_rows.append(A[i_]); b_ub.append(hi)
            A_ub_rows.append(-A[i_]); b_ub.append(-lo)

    lbv = np.zeros(n)
    ubv = np.full(n, np.inf)
    for cname in col_order:
        j = cidx[cname]
        if cname in free_vars:
            lbv[j], ubv[j] = -np.inf, np.inf
        if cname in lb:
            lbv[j] = lb[cname]
        if cname in ub:
            ubv[j] = ub[cname]

    if maximize:
        c = -c

    glp = GeneralLP(
        c=c,
        A_ub=np.array(A_ub_rows).reshape(-1, n) if A_ub_rows else None,
        b_ub=np.array(b_ub) if A_ub_rows else None,
        A_eq=np.array(A_eq_rows).reshape(-1, n) if A_eq_rows else None,
        b_eq=np.array(b_eq) if A_eq_rows else None,
        lb=lbv, ub=ubv, name=name,
    )
    glp.maximize = maximize   # objective was negated; flag for reporting
    return glp


def read_mps(path: str) -> GeneralLP:
    with open(path) as f:
        return read_mps_string(f.read())
