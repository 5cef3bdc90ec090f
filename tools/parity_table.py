#!/usr/bin/env python3
"""Per-entry engine-vs-DuckDB parity table (round-16 verdict task 7).

Usage: python3 tools/parity_table.py <bench_json> <oracle_bench_log> [--md]

<bench_json>: graft.Bench's full-precision JSON line (file containing it,
or a BENCH_r*.json whose "raw"/"queries" carries the per-query medians).
<oracle_bench_log>: stdout of tools/oracle_bench.py (lines
"qNN_name: X.XXX s (runs: ...)").

Prints every hashed entry's engine/oracle ratio sorted worst-first and
flags entries whose engine median exceeds 2x DuckDB (the verdict's
receipt threshold; fixed-cost streaming entries are annotated, not
exempted here - the exemption note lives in BASELINE.md).
"""
import json, re, sys

STREAMING_FIXED_COST = {
    # run-to-completion micro-batch entries: per-trigger framework cost
    # dominates at gate SFs (A/B'd round 11 - "no knob wins")
    "q51_stream_hourly", "q65_stream_join", "q89_stream_sessions",
    "q126_stream_dedup", "q142_stream_edit", "q147_stream_bloom",
    "q149_stream_hll", "q153_stream_cms", "q155_stream_kmv",
    "q156_stream_sample", "q162_stream_lm", "q165_stream_weighted",
    "q166_stream_anomaly", "q172_ppl_stream", "q176_stream_spans",
    "q183_stream_leakage", "q191_nb_stream", "q194_dsir_stream",
    "q198_stream_admission", "q204_stream_gate_ensemble",
    "q206_stream_release", "q208_stream_semdedup", "q216_stream_simhash",
    "q218_stream_phash", "q222_stream_ann", "q107_stream_static",
}


def load_engine(path):
    text = open(path).read()
    # accept either a raw Bench line or a driver BENCH_r*.json wrapper
    for m in re.finditer(r'\{.*"queries"\s*:\s*\{.*', text):
        try:
            d = json.loads(m.group(0))
            if "queries" in d:
                return {k: float(v) for k, v in d["queries"].items()}
        except json.JSONDecodeError:
            continue
    d = json.loads(text)
    return {k: float(v) for k, v in d["queries"].items()}


def load_oracle(path):
    out = {}
    for line in open(path):
        m = re.match(r"(q\w+): ([0-9.]+) s \(runs:", line)
        if m:
            out[m.group(1)] = float(m.group(2))
    return out


def main(bench_path, oracle_path, md=False):
    eng = load_engine(bench_path)
    ora = load_oracle(oracle_path)
    rows = []
    for q in sorted(set(eng) & set(ora)):
        if eng[q] <= 0:
            continue
        # floor the denominator at 1 ms: a sub-ms DuckDB median prints
        # as 0.000 (q03_literal) and would otherwise divide by zero
        rows.append((eng[q] / max(ora[q], 0.001), q, eng[q], ora[q]))
    rows.sort(reverse=True)
    over = [r for r in rows if r[0] > 2.0]
    sep = "|" if md else "  "
    if md:
        print("| entry | engine (s) | DuckDB (s) | ratio | note |")
        print("|---|---|---|---|---|")
    for ratio, q, e, o in rows:
        note = "fixed-cost streaming" if q in STREAMING_FIXED_COST else ""
        flag = " **>2x**" if ratio > 2.0 else ""
        if md:
            print(f"| {q} | {e:.2f} | {o:.2f} | {ratio:.2f}{flag} | {note} |")
        else:
            print(f"{q:36s} {e:8.2f} {o:8.2f}  {ratio:6.2f}{flag} {note}")
    te = sum(e for _, q, e, _ in rows)
    to = sum(o for _, q, _, o in rows)
    print(f"\ncommon entries: {len(rows)}; engine total {te:.1f} s vs "
          f"DuckDB {to:.1f} s -> {te / to:.2f}x; entries >2x: {len(over)} "
          f"({sum(1 for r in over if r[1] not in STREAMING_FIXED_COST)} non-streaming)")


if __name__ == "__main__":
    md = "--md" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--md"]
    main(args[0], args[1], md)
