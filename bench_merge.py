"""Merge multiple bench_scaling runs/worker samples of the SAME code into
one canonical BENCH/scaling.json + BENCH/BASELINE.md.

Why: this sandbox's shared host shows 3-4x one-sided wall-clock noise
(neighbors only ever SLOW a run). The unbiased estimator of each level's
true capacity is therefore the best-of over ALL samples of that level, with
equal sampling effort per level (alternating windows) so neither level is
favored. This script takes a full bench_scaling summary (for structure +
calibration) plus any number of extra worker-output JSONs, recomputes the
per-level bests and efficiencies with the same best-of logic as
bench_scaling.main, and rewrites the canonical outputs recording EVERY
sample (all_runs) so the merge is auditable.

    python bench_merge.py BENCH/scaling.json /tmp/extra_q*.json
"""

from __future__ import annotations

import json
import sys

BEST_MAX = ("build_docs_per_sec", "build_postings_per_sec", "batch_qps")
BEST_MIN = ("build_wall_s", "batch_wall_s", "lat_p50_s", "lat_p95_s",
            "local_lat_p50_s", "local_lat_p95_s")


def main() -> None:
    base = json.load(open(sys.argv[1]))
    extras = [json.load(open(p)) for p in sys.argv[2:]]
    runs = {int(lv): list(rs) for lv, rs in base["all_runs"].items()}
    for r in extras:
        runs.setdefault(int(r["cores"]), []).append(r)

    # The best-of estimator's validity rests on EQUAL sampling effort per
    # level (advice r4: a warning alone still lets an over-sampled level
    # bias the published efficiency). Trim every level to the minimum
    # common sample count — keeping the FIRST n samples in arrival order,
    # i.e. the chronologically alternating windows both levels share —
    # and record the trim so the merge stays auditable.
    n_min = min(len(rs) for rs in runs.values())
    trimmed = {lv: len(rs) - n_min for lv, rs in runs.items()}
    if any(trimmed.values()):
        print(f"trimming to {n_min} samples/level (dropped: "
              f"{ {lv: n for lv, n in trimmed.items() if n} })",
              file=sys.stderr)
        runs = {lv: rs[:n_min] for lv, rs in runs.items()}

    results = {}
    for lv, rs in runs.items():
        best = dict(rs[0])
        for r in rs[1:]:
            for k in BEST_MAX:
                vals = [v for v in (best.get(k), r.get(k)) if v is not None]
                best[k] = max(vals) if vals else None
            for k in BEST_MIN:
                vals = [v for v in (best.get(k), r.get(k)) if v is not None]
                best[k] = min(vals) if vals else None
        best["all_digests"] = sorted({r["result_digest"] for r in rs})
        results[lv] = best

    # identical code across all samples (same result digest) — enforce,
    # don't just record (advice r3): divergent digests would mean the
    # levels are not runs of the same code/input
    all_digests = {r["result_digest"] for rs in runs.values() for r in rs}
    if len(all_digests) != 1:
        raise SystemExit(
            f"refusing to merge: result digests diverge across samples "
            f"({sorted(all_digests)}) — these are not runs of the same "
            "code/input")

    lo, hi = min(runs), max(runs)
    factor = hi / lo
    build_ratio = (results[hi]["build_docs_per_sec"]
                   / results[lo]["build_docs_per_sec"])
    query_ratio = results[hi]["batch_qps"] / results[lo]["batch_qps"]
    delivered = base["delivered_cpu_ratio"]
    digests = {d for lv in runs for d in results[lv]["all_digests"]}

    out = dict(base)
    out["levels"] = {str(lv): results[lv] for lv in sorted(runs)}
    out["all_runs"] = {str(lv): runs[lv] for lv in sorted(runs)}
    out["n_samples_per_level"] = {str(lv): len(runs[lv])
                                  for lv in sorted(runs)}
    out["build_scaling_efficiency"] = round(build_ratio / factor, 3)
    out["query_scaling_efficiency"] = round(query_ratio / factor, 3)
    out["build_scaling_efficiency_vs_delivered_cpu"] = round(
        build_ratio / delivered, 3)
    out["query_scaling_efficiency_vs_delivered_cpu"] = round(
        query_ratio / delivered, 3)
    out["results_identical_across_levels"] = len(digests) == 1
    out["merged_from_samples"] = len(sys.argv) - 2
    out["samples_trimmed_per_level"] = {str(lv): trimmed[lv]
                                        for lv in sorted(trimmed)}
    json.dump(out, open("BENCH/scaling.json", "w"), indent=2)
    print(json.dumps({k: out[k] for k in (
        "rows", "n_samples_per_level", "build_scaling_efficiency",
        "query_scaling_efficiency",
        "build_scaling_efficiency_vs_delivered_cpu",
        "query_scaling_efficiency_vs_delivered_cpu",
        "delivered_cpu_ratio", "results_identical_across_levels")}))


if __name__ == "__main__":
    main()
