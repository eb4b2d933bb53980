#!/usr/bin/env python3
"""Min-merge a bench run file into the committed BENCH_DETAIL.json.

The ONLY sanctioned path for partial (solo/probe) or re-measure data into
the committed min-protocol reference. Bench.scala writes solo runs
(SPARK_GRAFT_ONLY set) to the uncommitted BENCH_SOLO.json; this script is
how their clean-window minima reach BENCH_DETAIL.json. It refuses:

  * mixed scale factors (source "sf" != target "sf") — the round-14 slip
    was an sf3 solo detail masquerading as the sf0.1 reference;
  * dirty calibration windows (source factor_pre or factor_post > 1.1) —
    a slow-window run can only ever make the reference slower-looking via
    a min-merge of NOTHING, so just refuse it outright;
  * a missing/garbled source or target.

Merged artifact: per-query min over the union of keys, value = sum of the
merged queries, n_queries = count, calib kept from whichever input has the
LOWER factor_pre (the cleaner window), plus a "protocol" note recording
the merge. Writes target in place; run `git diff BENCH_DETAIL.json` and a
per-entry sanity ratio check is printed for eyeballing before commit.

Usage: python3 tools/merge_bench.py [SOURCE] [TARGET]
       (defaults: BENCH_SOLO.json BENCH_DETAIL.json)
"""
import json
import sys


def die(msg: str) -> None:
    print(f"merge_bench: REFUSED: {msg}", file=sys.stderr)
    sys.exit(1)


def load(path: str) -> dict:
    try:
        with open(path) as f:
            d = json.load(f)
    except (OSError, json.JSONDecodeError) as e:
        die(f"cannot read {path}: {e}")
    for k in ("queries", "sf"):
        if k not in d:
            die(f"{path} has no '{k}' field — not a bench detail artifact")
    return d


def factor(d: dict, which: str) -> float:
    return float(d.get("calib", {}).get(which, 99.0))


def main() -> None:
    src_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SOLO.json"
    dst_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_DETAIL.json"
    src, dst = load(src_path), load(dst_path)

    if src["sf"] != dst["sf"]:
        die(f"mixed scale factors: source sf={src['sf']!r} vs "
            f"target sf={dst['sf']!r}")
    # core-count guard (round-15 hole: the driver's 8-core full run
    # overwrote the 32-core reference; at sf0.1 many entries are FASTER
    # on fewer cores, so an 8-core min would be a poisoned reference).
    # A missing "cpus" field (pre-round-16 artifact) is treated as
    # unknown and refused on the SOURCE side — re-run the probe; the
    # target may be grandfathered only if the source declares 32.
    src_cpus = src.get("cpus")
    dst_cpus = dst.get("cpus", "32")  # committed reference predates the field
    if src_cpus is None:
        die("source has no 'cpus' field — re-run the probe with a "
            "round-16+ Bench build")
    if src_cpus != dst_cpus:
        die(f"core-count mismatch: source cpus={src_cpus!r} vs "
            f"target cpus={dst_cpus!r}")
    for w in ("factor_pre", "factor_post"):
        f = factor(src, w)
        if f > 1.1:
            die(f"source calibration {w}={f:.3f} > 1.1 — dirty host window; "
                "re-run the probe in a clean window")

    sq, dq = src["queries"], dst["queries"]
    merged, improved, added = {}, [], []
    for k in sorted(set(sq) | set(dq)):
        if k in sq and k in dq:
            merged[k] = min(sq[k], dq[k])
            if sq[k] < dq[k]:
                improved.append((k, dq[k], sq[k]))
        elif k in dq:
            merged[k] = dq[k]
        else:
            merged[k] = sq[k]
            added.append(k)

    # sanity ratio print: impossible improvements (< 0.33x) are the r14
    # slip's signature — surface them loudly even though sf matching
    # should make them structurally impossible now
    suspicious = [(k, old, new) for k, old, new in improved if new < old / 3]
    out = dict(dst)
    out["queries"] = merged
    out["value"] = round(sum(merged.values()), 3)
    out["n_queries"] = len(merged)
    if factor(src, "factor_pre") < factor(dst, "factor_pre"):
        out["calib"] = src.get("calib", dst.get("calib", {}))
    out["protocol"] = (
        "per-entry MIN across clean-window runs (calib factors <= 1.1), "
        f"merged via tools/merge_bench.py; last source: {src_path}")

    with open(dst_path, "w") as f:
        json.dump(out, f)
    print(f"merged {len(sq)} source entries into {dst_path}: "
          f"{len(improved)} improved, {len(added)} added, "
          f"total {dst.get('value')} -> {out['value']}")
    for k, old, new in improved:
        print(f"  {k}: {old:.3f} -> {new:.3f}")
    if suspicious:
        print("WARNING: implausible (>3x) improvements — verify the source "
              "run before committing:", file=sys.stderr)
        for k, old, new in suspicious:
            print(f"  {k}: {old:.3f} -> {new:.3f}", file=sys.stderr)


if __name__ == "__main__":
    main()
