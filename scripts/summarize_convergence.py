"""Convergence-to-floor summary (round-4 VERDICT #1).

Reads the recon-floor and latent-sampled `summary_stats.json` written by
cli.test and emits the BASELINE.md markdown table: per-protein and mean
metrics side by side with the latent-vs-floor gap quantified, plus the
Stage-1/Stage-2 training endpoints from the run logs.

    python scripts/summarize_convergence.py results/convergence
"""

import json
import os
import sys

METRICS = ["rmsd_aligned", "ged", "clash", "graph_valid_ratio", "div"]


def load(path):
    with open(path) as f:
        return json.load(f)


def mean(stats, key):
    # Per-protein rows only: cli.test also writes __global__ (scalar means,
    # would double-count) and __global_stats__ ({mean,std} dicts, would
    # TypeError under sum()).
    vals = [v[key] for k, v in stats.items() if isinstance(v, dict)
            and not k.startswith("__") and key in v]
    return sum(vals) / max(len(vals), 1)


def main(root):
    recon = load(os.path.join(root, "eval_recon", "summary_stats.json"))
    latent = load(os.path.join(root, "eval_latent", "summary_stats.json"))
    prots = sorted(k for k in recon if k in latent and
                   isinstance(recon[k], dict) and not k.startswith("__"))

    print("| metric | recon floor (Stage 1) | latent sampled (Stage 1+2) "
          "| gap |")
    print("|---|---|---|---|")
    for m in METRICS:
        r, l = mean(recon, m), mean(latent, m)
        gap = l - r
        print(f"| {m} | {r:.4f} | {l:.4f} | {gap:+.4f} |")

    print()
    print("| protein | recon rmsd_aligned | latent rmsd_aligned "
          "| recon ged | latent ged |")
    print("|---|---|---|---|---|")
    for p in prots:
        print(f"| {p.removesuffix('.npz')} "
              f"| {recon[p]['rmsd_aligned']:.4f} "
              f"| {latent[p]['rmsd_aligned']:.4f} "
              f"| {recon[p]['ged']:.4f} | {latent[p]['ged']:.4f} |")

    s1 = os.path.join(root, "vqvae", "metrics.jsonl")
    if os.path.exists(s1):
        best = None
        with open(s1) as f:
            for line in f:
                row = json.loads(line)
                if row.get("split") == "val" and "recon" in row:
                    if best is None or row["recon"] < best["recon"]:
                        best = row
        if best:
            print(f"\nStage-1 best val: recon {best['recon']:.4f} "
                  f"(epoch {best['step']})")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "results/convergence")
