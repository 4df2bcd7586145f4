"""Summarize /tmp/tpu_runs outputs into one markdown table.

Run automatically at the end of tools/tpu_queue.sh (and manually any time):
parses the JSON lines emitted by step_bench / scatter_bench / capacity_probe
/ bench.py and writes /tmp/tpu_runs/SUMMARY.md with winners ranked, so the
measurement artifacts are decision-ready even if nobody is watching when the
tunnel recovers.

Usage: python tools/tpu_summarize.py [runs_dir]
"""

import json
import os
import sys


def _json_lines(path):
    if not os.path.exists(path):
        return []
    out = []
    for line in open(path, errors="replace"):
        line = line.strip()
        if line.startswith("{"):
            try:
                out.append(json.loads(line))
            except ValueError:
                pass
    return out


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_runs"
    lines = ["# TPU run summary", ""]

    rows = [r for r in _json_lines(os.path.join(d, "step_bench.out"))
            if "variant" in r]
    if rows:
        ok = [r for r in rows if "words_per_sec" in r]
        ok.sort(key=lambda r: -r["words_per_sec"])
        lines += ["## step_bench (words/sec, best first)", "",
                  "| variant | us/step | words/sec | compile s |",
                  "|---|---|---|---|"]
        for r in ok:
            lines.append(f"| {r['variant']} | {r['us_per_step']} "
                         f"| {r['words_per_sec']:,.0f} | {r['compile_s']} |")
        for r in rows:
            if "error" in r:
                lines.append(f"| {r['variant']} | ERROR | "
                             f"{r['error'][:80]} | |")
        if ok:
            base = next((r for r in ok if r["variant"] == "fused"), None)
            if base and ok[0]["variant"] != "fused":
                sp = ok[0]["words_per_sec"] / base["words_per_sec"]
                lines += ["", f"Winner: **{ok[0]['variant']}** at "
                          f"{sp:.2f}x the fused baseline."]
        lines.append("")

    for name, title in [("scatter_bench", "scatter_bench"),
                        ("capacity_3.7M_analyze",
                         "capacity 3.7M buffer report (compile-only)"),
                        ("capacity_3.7M", "capacity 3.7M x 800d"),
                        ("capacity_3.7M_dense", "capacity 3.7M dense-hot"),
                        ("bench", "bench.py (driver headline)"),
                        ("smoke_tpu", "on-device smoke")]:
        out_path = os.path.join(d, f"{name}.out")
        if not os.path.exists(out_path):
            continue
        js = _json_lines(out_path)
        lines.append(f"## {title}")
        lines.append("")
        if js:
            for r in js[-6:]:
                lines.append(f"- `{json.dumps(r)}`")
        else:
            tail = open(out_path, errors="replace").read().splitlines()[-4:]
            lines += [f"    {t}" for t in tail] or ["(empty)"]
        err = os.path.join(d, f"{name}.err")
        if os.path.exists(err) and os.path.getsize(err):
            last = open(err, errors="replace").read().splitlines()[-2:]
            lines += [f"    stderr: {t}" for t in last]
        lines.append("")

    qlog = os.path.join(d, "queue.log")
    if os.path.exists(qlog):
        lines += ["## queue log", ""]
        lines += [f"    {t}" for t in
                  open(qlog, errors="replace").read().splitlines()]

    os.makedirs(d, exist_ok=True)
    out = os.path.join(d, "SUMMARY.md")
    open(out, "w").write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
