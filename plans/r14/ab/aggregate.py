"""Aggregate the interleaved A/B legs into the decisive numbers.

Per-tree per-query value = min over that tree's legs of the leg's
queries_min (min-of-warm within a leg, min over legs across legs) —
the same min-of-warm discipline bench.py itself uses, extended over
the interleave so a noise burst in one leg cannot charge one tree.
"""
import json
import sys

def load(tag):
    return json.load(open(f"plans/r14/ab/{tag}_detail.json"))

def main():
    # default: the fair 2-vs-2 interleave (0.754 ratio).  --all adds the
    # two final-tree legs (new3/new4, benched after the interleave), which
    # reproduces the 0.744 ratio quoted in OPTIMIZATION_r14.md — min-over-
    # legs then favors the tree with more legs, which is why the 4-leg
    # number is the headline and this one is labelled (ADVICE r14).
    old_legs = [load(t) for t in ("old1", "old2")]
    new_tags = ("new1", "new2", "new3", "new4") if "--all" in sys.argv else ("new1", "new2")
    new_legs = [load(t) for t in new_tags]

    def min_over(legs, key):
        out = {}
        for leg in legs:
            for q, v in leg.get(key, {}).items():
                out[q] = min(out.get(q, float("inf")), v)
        return out

    qo = min_over(old_legs, "queries_min")
    qn = min_over(new_legs, "queries_min")
    common = sorted(set(qo) & set(qn))
    only_old = sorted(set(qo) - set(qn))
    only_new = sorted(set(qn) - set(qo))
    to = sum(qo[k] for k in common)
    tn = sum(qn[k] for k in common)
    print(f"legs: old calib(v1)={[l.get('calib') for l in old_legs]} "
          f"new calib(v2)={[l.get('calib') for l in new_legs]}")
    print(f"loads: old={[l.get('load_start') for l in old_legs]} "
          f"new={[l.get('load_start') for l in new_legs]}")
    print(f"\ncommon subset: {len(common)} queries"
          + (f" (only-old: {only_old}, only-new: {only_new})" if only_old or only_new else ""))
    print(f"min-total: old={to:.1f}s new={tn:.1f}s ratio={tn/to:.3f}")

    movers = sorted(common, key=lambda k: qn[k] - qo[k])
    print("\nbiggest improvements:")
    for k in movers[:12]:
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

    # per-leg totals for the stability check
    print("\nper-leg common-subset totals (stability):")
    legs = [("old1", old_legs[0]), ("old2", old_legs[1])] + list(
        zip(new_tags, new_legs)
    )
    for tag, leg in legs:
        qm = leg.get("queries_min", {})
        t = sum(qm[k] for k in common if k in qm)
        print(f"  {tag}: {t:.1f}s")

if __name__ == "__main__":
    main()
