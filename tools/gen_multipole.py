"""Generate exact Cartesian derivative tables of 1/r up to a given order.

The reference hand-unrolls the potential-derivative tensors to order 5
(``crates/gravity/src/multipole.rs:584-1350``, 1595 LoC of manual algebra).
Instead of hand-writing (or copying) those, we derive them symbolically:

Every derivative ∂^(i,j,k) (1/r) is a finite sum of terms
``coef · x^a y^b z^c · r^(-m)`` — a family closed under differentiation:

    ∂x [x^a y^b z^c r^-m] = a x^(a-1) y^b z^c r^-m − m x^(a+1) y^b z^c r^-(m+2)

Repeated application from D_0 = r^-1 yields exact integer-coefficient tables
for all multi-indices.  The output is (a) a C header with static term tables
consumed by ``csrc/octree.cpp``, and (b) a Python module with the same
tables for the jnp mirror (``pynbodyext_tpu/gravity/multipole.py``).

Run: ``python tools/gen_multipole.py`` (idempotent; outputs are committed).
"""

from __future__ import annotations

from fractions import Fraction
from typing import Dict, Tuple

MAX_ORDER = 6  # moments to order 5 + one extra derivative for accelerations

Term = Tuple[int, int, int, int]  # (a, b, c, m) ⇒ x^a y^b z^c r^-m
Poly = Dict[Term, Fraction]


def differentiate(poly: Poly, axis: int) -> Poly:
    out: Poly = {}
    for (a, b, c, m), coef in poly.items():
        e = [a, b, c]
        # power-rule part
        if e[axis] > 0:
            e2 = list(e)
            e2[axis] -= 1
            key = (e2[0], e2[1], e2[2], m)
            out[key] = out.get(key, Fraction(0)) + coef * e[axis]
        # chain-rule part: d/dx r^-m = -m x r^-(m+2)
        e3 = list(e)
        e3[axis] += 1
        key = (e3[0], e3[1], e3[2], m + 2)
        out[key] = out.get(key, Fraction(0)) - coef * m
    return {k: v for k, v in out.items() if v != 0}


def multi_indices(max_order: int):
    out = []
    for total in range(max_order + 1):
        for i in range(total, -1, -1):
            for j in range(total - i, -1, -1):
                k = total - i - j
                out.append((i, j, k))
    return out


def build_tables(max_order: int):
    idx_of = {}
    tables = {}
    base: Poly = {(0, 0, 0, 1): Fraction(1)}  # 1/r
    cache: Dict[Tuple[int, int, int], Poly] = {(0, 0, 0): base}

    def derive(n):
        if n in cache:
            return cache[n]
        # reduce along the first nonzero axis
        for ax in range(3):
            if n[ax] > 0:
                prev = list(n)
                prev[ax] -= 1
                poly = differentiate(derive(tuple(prev)), ax)
                cache[n] = poly
                return poly
        raise AssertionError

    for order_pos, n in enumerate(multi_indices(max_order)):
        idx_of[n] = order_pos
        tables[n] = derive(n)
    return idx_of, tables


def _pow_expr(var: str, p: int, locals_used: dict) -> str:
    if p == 0:
        return ""
    if p == 1:
        return var
    name = f"{var}{p}"
    locals_used.setdefault(name, (var, p))
    return name


def emit_unrolled_eval(idx_of, tables, order: int, accel: bool) -> str:
    """Straight-line evaluator for one multipole order.

    potential:  φ_partial(x,y,z,M) = Σ_n M[n]·(−1)^{|n|}·D_n   (caller negates)
    accel:      out[i] = Σ_n M[n]·(−1)^{|n|}·D_{n+e_i}
    """
    name = ("pnx_acc_mp_o" if accel else "pnx_phi_mp_o") + str(order)
    pow_locals: dict = {}
    max_m = 2 * (order + (1 if accel else 0)) + 1

    def terms_for(poly, mpos: int) -> str:
        parts = []
        for (a, b, c, m), coef in sorted(poly.items()):
            factors = []
            for var, p in (("x", a), ("y", b), ("z", c)):
                e = _pow_expr(var, p, pow_locals)
                if e:
                    factors.append(e)
            factors.append(_pow_expr("ri", m, pow_locals) or "1.0")
            cf = float(coef)
            expr = "*".join(factors)
            parts.append(f"{cf:+.1f}*{expr}")
        return f"M[{mpos}]*(" + "".join(parts) + ")"

    body_terms = []
    if accel:
        sums = {0: [], 1: [], 2: []}
        for n, pos_i in idx_of.items():
            if sum(n) > order:
                continue
            sign = -1.0 if sum(n) % 2 else 1.0
            for ax, shifted in enumerate([(n[0] + 1, n[1], n[2]),
                                          (n[0], n[1] + 1, n[2]),
                                          (n[0], n[1], n[2] + 1)]):
                poly = tables[shifted]
                t = terms_for(poly, pos_i)
                sums[ax].append(("+" if sign > 0 else "-") + t)
        lines_out = [f"  out[{ax}] = " + "".join(sums[ax]) + ";"
                     for ax in range(3)]
        body = "\n".join(lines_out)
        sig = (f"static inline void {name}(double x, double y, double z, "
               f"const double* M, double* out)")
    else:
        for n, pos_i in idx_of.items():
            if sum(n) > order:
                continue
            sign = -1.0 if sum(n) % 2 else 1.0
            t = terms_for(tables[n], pos_i)
            body_terms.append(("+" if sign > 0 else "-") + t)
        body = "  return " + "".join(body_terms) + ";"
        sig = (f"static inline double {name}(double x, double y, double z, "
               f"const double* M)")

    # emit power locals in dependency order
    decls = ["  double r2 = x*x + y*y + z*z;",
             "  double ri = 1.0/sqrt(r2);"]
    for p in range(2, 7):
        if f"x{p}" in pow_locals or f"y{p}" in pow_locals \
                or f"z{p}" in pow_locals or p <= 1:
            pass
    done = {"x": 1, "y": 1, "z": 1, "ri": 1}
    for lname in sorted(pow_locals,
                        key=lambda s: (s[0] if not s.startswith("ri")
                                       else "r", int(s.lstrip("xyzri") or 1))):
        var, p = pow_locals[lname]
        prev = done[var]
        while prev < p:
            prev += 1
            nm = f"{var}{prev}" if prev > 1 else var
            src = f"{var}{prev-1}" if prev - 1 > 1 else var
            decls.append(f"  double {nm} = {src}*{var};")
        done[var] = max(done[var], p)
    # dedupe decls (while-loop may re-add)
    seen = set()
    decls_u = []
    for d in decls:
        if d not in seen:
            seen.add(d)
            decls_u.append(d)
    return sig + " {\n" + "\n".join(decls_u) + "\n" + body + "\n}\n"


def emit_dispatchers(max_useful_order: int) -> str:
    lines = ["static inline double pnx_phi_mp(int order, double x, double y,"
             " double z, const double* M) {",
             "  switch (order) {"]
    for L in range(1, max_useful_order + 1):
        lines.append(f"    case {L}: return pnx_phi_mp_o{L}(x, y, z, M);")
    lines.append("    default: return 0.0;")
    lines.append("  }\n}")
    lines.append("static inline void pnx_acc_mp(int order, double x, "
                 "double y, double z, const double* M, double* out) {")
    lines.append("  switch (order) {")
    for L in range(1, max_useful_order + 1):
        lines.append(f"    case {L}: pnx_acc_mp_o{L}(x, y, z, M, out); "
                     "return;")
    lines.append("    default: out[0]=out[1]=out[2]=0.0; return;")
    lines.append("  }\n}")
    return "\n".join(lines) + "\n"


def emit_c(idx_of, tables, max_order) -> str:
    lines = [
        "// AUTO-GENERATED by tools/gen_multipole.py — do not edit.",
        "// Exact Cartesian derivative tables of 1/r:",
        "// D[n] = sum over terms of coef * x^a y^b z^c * inv_r^m.",
        "#pragma once",
        "",
        f"#define PNX_MAX_ORDER {max_order}",
        f"#define PNX_N_INDICES {len(idx_of)}",
        "",
        "typedef struct { short a, b, c, m; double coef; } pnx_term;",
        "",
        "typedef struct { short i, j, k; int offset; int count; }"
        " pnx_index_entry;",
        "",
    ]
    terms = []
    entries = []
    for n, pos in idx_of.items():
        poly = tables[n]
        offset = len(terms)
        for (a, b, c, m), coef in sorted(poly.items()):
            assert coef.denominator == 1
            terms.append(f"  {{{a}, {b}, {c}, {m}, {float(coef):.1f}}},")
        entries.append(
            f"  {{{n[0]}, {n[1]}, {n[2]}, {offset}, {len(poly)}}},")
    lines.append(f"static const pnx_term PNX_TERMS[{len(terms)}] = {{")
    lines.extend(terms)
    lines.append("};")
    lines.append("")
    lines.append(
        f"static const pnx_index_entry PNX_INDEX[{len(entries)}] = {{")
    lines.extend(entries)
    lines.append("};")
    lines.append("")
    lines.append("#include <math.h>")
    lines.append("")
    lines.append("// --- machine-generated unrolled evaluators ------------")
    for L in range(1, max_order):  # orders 1..5 (6 is only for acc shift)
        lines.append(emit_unrolled_eval(idx_of, tables, L, accel=False))
        lines.append(emit_unrolled_eval(idx_of, tables, L, accel=True))
    lines.append(emit_dispatchers(max_order - 1))
    return "\n".join(lines)


def emit_py(idx_of, tables, max_order) -> str:
    lines = [
        '"""AUTO-GENERATED by tools/gen_multipole.py — do not edit.',
        "",
        "Exact Cartesian derivative tables of 1/r (see the generator for the",
        'derivation); mirrors csrc/multipole_tables.h for the jnp path."""',
        "",
        f"MAX_ORDER = {max_order}",
        "",
        "# multi-index -> position (canonical ordering by total order)",
        f"INDEX_OF = {dict(idx_of)!r}",
        "",
        "# multi-index -> [(a, b, c, m, coef), ...] with",
        "#   D[n](x,y,z) = sum coef * x^a y^b z^c * r^-m",
        "TABLES = {",
    ]
    for n, poly in tables.items():
        terms = [(a, b, c, m, float(coef))
                 for (a, b, c, m), coef in sorted(poly.items())]
        lines.append(f"    {n!r}: {terms!r},")
    lines.append("}")
    lines.append("")
    return "\n".join(lines)


def main():
    idx_of, tables = build_tables(MAX_ORDER)
    with open("csrc/multipole_tables.h", "w") as f:
        f.write(emit_c(idx_of, tables, MAX_ORDER))
    with open("pynbodyext_tpu/gravity/_multipole_tables.py", "w") as f:
        f.write(emit_py(idx_of, tables, MAX_ORDER))
    n_terms = sum(len(t) for t in tables.values())
    print(f"generated {len(idx_of)} multi-indices, {n_terms} terms "
          f"(order ≤ {MAX_ORDER})")


if __name__ == "__main__":
    main()
