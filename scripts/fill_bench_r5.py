"""Fill BENCH.md round-5 placeholders from the recorded JSONs.

    python scripts/fill_bench_r5.py

Reads BENCH_r5_measure.json + BENCH_local_r5.jsonl, computes the derived
numbers (medians, ratios, per-stage speedups), and substitutes the
⟨TOKEN⟩ placeholders in BENCH.md in place. Idempotent only in the sense
that a fully-substituted file has no tokens left — rerunning is a no-op.
"""

from __future__ import annotations

import json
import statistics

M = json.load(open("BENCH_r5_measure.json"))
local = [json.loads(ln) for ln in open("BENCH_local_r5.jsonl")]

med = M["median_turns_per_sec"]
runs = M["pipeline_sec_runs"]
tps = M["turns_per_sec_runs"]
turns = M["turns"]


def fmt(x, nd=1):
    return f"{x:,.{nd}f}".rstrip("0").rstrip(".") if isinstance(x, float) else f"{x:,}"


def med_of(key, field="value"):
    return statistics.median(runs[key])


trip256 = M["grown_triples"]
ratio = trip256 / turns  # triples per turn at the grown universe

hg_c4_sec = statistics.median(runs["head_grown_c4"])
hg_c1_sec = statistics.median(runs["head_grown_c1"])

s1 = M["stage_secs_last"]["head_grown_c1"]
s4 = M["stage_secs_last"]["head_grown_c4"]

# sf0.1 local[32] medians
l32_pipe = statistics.median(d["value"] for d in local)
l32_turns = local[0]["turns"]
l32_trip = local[0]["triples"]


def qmed(q):
    vals = [d["queries"][q] for d in local if q in d.get("queries", {})]
    return statistics.median(vals) if vals else float("nan")


cc4 = M.get("grown_cc_round_stats_c4") or []
ccsum = (
    f"{len(cc4)} rounds at c4, frontiers "
    + " → ".join(str(r.get("frontier", r) if isinstance(r, dict) else r)
                 for r in cc4[:8])
    if cc4 else "(stats empty — see JSON)"
)

subs = {
    "⟨R4C4⟩": fmt(med["r4_c4"], 0),
    "⟨HFC4⟩": fmt(med["head_fixed_c4"], 0),
    "⟨HF_R4⟩": f"{M['head_over_r4_fixed_c4']:.3f}",
    "⟨HGC4⟩": fmt(med["head_grown_c4"], 0),
    "⟨HG_HF⟩": f"{M['grown_over_fixed_c4']:.3f}",
    "⟨EQEDGES⟩": fmt(M["grown_equivalence_edges"]),
    "⟨TRIPSF01⟩": fmt(l32_trip),
    "⟨LOCAL32⟩": "{:.1f} (runs {})".format(
        l32_pipe, "/".join("{:.1f}".format(d["value"]) for d in local)
    ),
    "⟨L32TPS⟩": fmt(l32_turns / l32_pipe, 0),
    "⟨L32TRPS⟩": fmt(l32_trip / l32_pipe, 0),
    "⟨TRIP256⟩": fmt(trip256),
    "⟨HGC4SEC⟩": f"{hg_c4_sec:.1f}",
    "⟨HGTRPS⟩": "≈" + fmt(med["head_grown_c4"] * ratio, 0),
    "⟨HGC1SEC⟩": f"{hg_c1_sec:.1f}",
    "⟨HGC1⟩": fmt(med["head_grown_c1"], 0),
    "⟨HGC1TRPS⟩": "≈" + fmt(med["head_grown_c1"] * ratio, 0),
    "⟨C1RUNS⟩": " / ".join(f"{v:.1f}" for v in runs["head_grown_c1"]),
    "⟨C4RUNS⟩": " / ".join(f"{v:.1f}" for v in runs["head_grown_c4"]),
    "⟨EFF⟩": f"{M['scaling_efficiency_1_to_4']:.3f}",
    "⟨CCSUMMARY⟩": ccsum,
    "⟨QMH⟩": f"{qmed('q_doc_minhash_pairs'):.2f}",
    "⟨QBFS⟩": f"{qmed('q_bfs3'):.2f}",
    "⟨QTOPO⟩": f"{qmed('q_toposort'):.2f}",
    "⟨QND⟩": f"{qmed('q_embed_neardup'):.2f}",
    "⟨QLSH⟩": f"{qmed('q_ann_lsh'):.2f}",
    "⟨QIVF⟩": f"{qmed('q_ann_ivf'):.2f}",
    "⟨QNB⟩": f"{qmed('q_neighbors'):.2f}",
    "⟨QTD⟩": f"{qmed('q_topdeps'):.2f}",
    "⟨QKN⟩": f"{qmed('q_known'):.2f}",
}
for stage, (t1, t4) in {
    "AD": ("alias_dict",) * 2, "TR": ("transcripts",) * 2,
    "ML": ("mentions_linked",) * 2, "EQ": ("equivalences",) * 2,
    "CC": ("cc_mapping",) * 2, "T3": ("triples",) * 2,
    "ED": ("edges",) * 2, "VX": ("vertices",) * 2,
}.items():
    a, b = s1.get(t1), s4.get(t4)
    subs[f"⟨S1{stage}⟩"] = f"{a:.1f}" if a is not None else "—"
    subs[f"⟨S4{stage}⟩"] = f"{b:.1f}" if b is not None else "—"
    subs[f"⟨SP{stage}⟩"] = (
        f"{(a / b) / 4.0:.2f}" if a and b else "—"
    )

text = open("BENCH.md").read()
for k, v in subs.items():
    text = text.replace(k, str(v))
open("BENCH.md", "w").write(text)
left = [ln for ln in text.splitlines() if "⟨" in ln]
print("unfilled lines:", len(left))
for ln in left:
    print(" ", ln)
