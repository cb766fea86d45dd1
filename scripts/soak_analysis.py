"""Soak end-game analysis -> markdown tables for docs/TRAINRUN.md.

    python scripts/soak_analysis.py RUN_DIR LOG1 [LOG2 ...]

Emits:
  1. loss/error milestone table (last record per iteration wins — resumed
     runs append; same de-dup rule as tools/trainrun_report.py);
  2. per-inner-iteration error_R/error_t contraction trajectory (VERDICT r3
     weak #3: does iter3 < iter0 appear by convergence?);
  3. periodic-eval trend parsed from the driver logs (refine iter 0..4
     summary dicts);
  4. steady-state wall rate from the timestamped iter lines across all logs.
"""

import ast
import json
import os.path as osp
import re
import sys


def load_metrics(run_dir):
    by_iter = {}
    with open(osp.join(run_dir, "metrics.json")) as f:
        for line in f:
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                continue
            by_iter[r["iteration"]] = r
    return [by_iter[i] for i in sorted(by_iter)]


def milestones(recs, points=14):
    idx = sorted({int(round(i * (len(recs) - 1) / (points - 1)))
                  for i in range(points)})
    keys = ["loss_total", "iter0/loss_total", "iter3/loss_total",
            "iter0/error_R", "iter3/error_R", "iter0/error_t",
            "iter3/error_t", "lr"]
    keys = [k for k in keys if k in recs[-1]]
    out = ["| iter | " + " | ".join(keys) + " |",
           "|---|" + "---|" * len(keys)]
    for i in idx:
        r = recs[i]
        out.append("| %d | " % r["iteration"]
                   + " | ".join(f"{r.get(k, float('nan')):.4g}" for k in keys)
                   + " |")
    return "\n".join(out)


def contraction(recs, n_pts=10):
    """iter0 vs iter3 error across training: the refine loop contracts when
    the iter3 column drops below iter0."""
    idx = sorted({int(round(i * (len(recs) - 1) / (n_pts - 1)))
                  for i in range(n_pts)})
    out = ["| iter | R@i0 | R@i1 | R@i2 | R@i3 | i3−i0 | t@i0 | t@i3 |",
           "|---|---|---|---|---|---|---|---|"]
    for i in idx:
        r = recs[i]
        if "iter3/error_R" not in r:
            continue
        R = [r.get(f"iter{j}/error_R", float("nan")) for j in range(4)]
        t = [r.get(f"iter{j}/error_t", float("nan")) for j in (0, 3)]
        out.append(f"| {r['iteration']} | " + " | ".join(f"{x:.2f}" for x in R)
                   + f" | {R[3]-R[0]:+.2f} | {t[0]:.4f} | {t[1]:.4f} |")
    return "\n".join(out)


EVAL_PAT = re.compile(r"^(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}).*refine iter (\d): (\{.*\})")
ITER_PAT = re.compile(r"^(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}),\d+ .*iter (\d+)/(\d+)")


def eval_trend(logs):
    """One block per periodic eval: metric table rows iter0..4."""
    blocks = []  # (timestamp, {refine_i: summary})
    for lp in logs:
        cur = {}
        with open(lp, errors="replace") as f:
            for line in f:
                m = EVAL_PAT.match(line)
                if not m:
                    continue
                i = int(m.group(2))
                if i == 0 and cur:
                    blocks.append(cur)
                    cur = {}
                try:
                    d = ast.literal_eval(
                        re.sub(r"np\.float64\(([^)]*)\)", r"\1", m.group(3)))
                except (ValueError, SyntaxError):
                    # nan/inf or stray parens literal_eval can't parse —
                    # skip the line instead of killing the whole analysis
                    continue
                cur[i] = (m.group(1), d)
        if cur:
            blocks.append(cur)
    out = []
    keys = ["IoU50", "IoU75", "re5te2", "re10te2", "re10te5"]
    for b in blocks:
        ts = b[0][0]
        out.append(f"\neval @ {ts}:")
        out.append("| refine iter | " + " | ".join(keys) + " |")
        out.append("|---|" + "---|" * len(keys))
        for i in sorted(b):
            d = b[i][1]
            out.append(f"| {i} | " + " | ".join(
                f"{d.get(k, float('nan')):.2f}" for k in keys) + " |")
    return "\n".join(out)


def wall_rate(logs):
    import datetime

    pts = []
    for lp in logs:
        with open(lp, errors="replace") as f:
            for line in f:
                m = ITER_PAT.match(line)
                if m:
                    t = datetime.datetime.strptime(m.group(1),
                                                   "%Y-%m-%d %H:%M:%S")
                    pts.append((t, int(m.group(2))))
    rates = []
    for (t0, i0), (t1, i1) in zip(pts, pts[1:]):
        dt = (t1 - t0).total_seconds()
        if i1 > i0 and 0 < dt < 120:  # drop stall/eval/restart intervals
            rates.append(dt / (i1 - i0))
    rates.sort()
    if not rates:
        return "n/a"
    med = rates[len(rates) // 2]
    return (f"{med*1000:.0f} ms/outer-iter median ({512/med:.0f} obj/s at "
            f"B=512, 4 optimizer steps per outer iter; {len(rates)} clean "
            f"50-iter intervals)")


def main():
    run_dir, logs = sys.argv[1], sys.argv[2:]
    recs = load_metrics(run_dir)
    print(f"records: {len(recs)} (iters {recs[0]['iteration']}.."
          f"{recs[-1]['iteration']})\n")
    print("## milestones\n")
    print(milestones(recs))
    print("\n## inner-iteration contraction\n")
    print(contraction(recs))
    print("\n## steady-state\n")
    print(wall_rate(logs))
    print("\n## eval trend")
    print(eval_trend(logs))


if __name__ == "__main__":
    main()
