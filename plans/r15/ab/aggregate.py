"""Aggregate the r15 interleaved bench legs into the decisive numbers.

Legs, in wall-clock order on one idle host: base1 (old tree, benched
before any r15 change), new1, old2 (r14 tree via a worktree at 50503ed),
new2.  Per-tree per-query value = min over that tree's legs of the leg's
queries_min — the same min-of-warm discipline bench.py itself uses,
extended over the interleave so a noise burst in one leg cannot charge
one tree.  Calib is v2 in every leg (comparable)."""

import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))


def load(tag):
    return json.load(open(os.path.join(HERE, f"{tag}_detail.json")))


def _tags(prefixes):
    out = []
    for t in prefixes:
        if os.path.exists(os.path.join(HERE, f"{t}_detail.json")):
            out.append(t)
    return out


OLD_TAGS = None
NEW_TAGS = None


def main():
    global OLD_TAGS, NEW_TAGS
    OLD_TAGS = _tags(("base1", "old2", "old3"))
    NEW_TAGS = _tags(("new1", "new2", "new3"))
    old_legs = [load(t) for t in OLD_TAGS]
    new_legs = [load(t) for t in NEW_TAGS]

    def min_over(legs, key):
        out = {}
        for leg in legs:
            for q, v in leg.get(key, {}).items():
                out[q] = min(out.get(q, float("inf")), v)
        return out

    qo = min_over(old_legs, "queries_min")
    qn = min_over(new_legs, "queries_min")
    common = sorted(set(qo) & set(qn))
    to = sum(qo[k] for k in common)
    tn = sum(qn[k] for k in common)
    print(f"calib(v2): old={[l.get('calib') for l in old_legs]} "
          f"new={[l.get('calib') for l in new_legs]}")
    print(f"loads: old={[l.get('load_start') for l in old_legs]} "
          f"new={[l.get('load_start') for l in new_legs]}")
    print(f"\ncommon subset: {len(common)} queries")
    print(f"min-total: old={to:.1f}s new={tn:.1f}s ratio={tn/to:.3f}")

    movers = sorted(common, key=lambda k: qn[k] - qo[k])
    print("\nbiggest improvements:")
    for k in movers[:15]:
        print(f"  {k:32s} {qo[k]:7.2f} -> {qn[k]:7.2f}  ({qn[k]-qo[k]:+.2f})")
    print("biggest regressions:")
    for k in movers[-6:]:
        print(f"  {k:32s} {qo[k]:7.2f} -> {qn[k]:7.2f}  ({qn[k]-qo[k]:+.2f})")

    for sect in ("mount", "layouts"):
        so = min_over(old_legs, sect)
        sn = min_over(new_legs, sect)
        cs = sorted(set(so) & set(sn))
        if cs:
            print(f"\n{sect}:")
            for k in cs:
                print(f"  {k:32s} {so[k]:9.3f} -> {sn[k]:9.3f}")

    print("\nper-leg common-subset totals (stability; calib v2 beside each):")
    for tag in sorted(OLD_TAGS + NEW_TAGS):
        leg = load(tag)
        qm = leg.get("queries_min", {})
        t = sum(qm[k] for k in common if k in qm)
        print(f"  {tag}: {t:.1f}s  (calib {leg.get('calib')}, "
              f"load {leg.get('load_start')})")


if __name__ == "__main__":
    main()
