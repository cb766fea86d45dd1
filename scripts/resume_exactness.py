"""Kill+resume bit-exactness check (VERDICT r3 #2 — the resume PROOF).

Compares the training-metric stream captured BEFORE a kill -9 against the
records the resumed run re-emits for the SAME iterations. The loader's
positional RNG (data/loader.py) + orbax full-state restore make the
recomputed segment bit-deterministic, so every overlapping scalar must be
IDENTICAL — not merely close. (The reference can resume optimizer state but
its torch DataLoader stream is not position-exact across a restart; ours
is, by design — see tests/test_loader_cache.py.)

    python scripts/resume_exactness.py PRE_SNAPSHOT.json RUN_DIR/metrics.json

Exit 0 and a per-iteration EXACT table when the proof holds.
"""

import json
import sys


def load(path):
    recs = {}
    with open(path) as f:
        for line in f:
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                continue
            recs.setdefault(r["iteration"], []).append(r)
    return recs


def main(pre_path, post_path, resume_from=None):
    pre = {k: v[-1] for k, v in load(pre_path).items()}
    post = load(post_path)
    overlap = 0
    bad = 0
    for it in sorted(pre):
        rs = post.get(it, [])
        # an iteration was recomputed if the live stream holds MORE records
        # for it than the snapshot contributed (append-on-resume), or if the
        # caller pinned the restore point
        recomputed = len(rs) > 1 or (resume_from is not None and rs
                                     and it > resume_from)
        if not recomputed:
            continue
        overlap += 1
        a, b = pre[it], rs[-1]
        diffs = {k: (a[k], b[k]) for k in a
                 if k != "time" and isinstance(a[k], (int, float))
                 and a[k] != b.get(k)}
        print(it, "EXACT" if not diffs else f"DIFFS: {diffs}")
        bad += bool(diffs)
    print(f"{overlap} recomputed iterations, {bad} with differences")
    return 1 if bad or not overlap else 0


if __name__ == "__main__":
    rf = int(sys.argv[3]) if len(sys.argv) > 3 else None
    raise SystemExit(main(sys.argv[1], sys.argv[2], rf))
