"""Corpus diversity report (round-4 verdict #7): measure what the synthetic
training corpus actually spans before betting a flagship run on growing it.

For each length bucket, sample record pairs and score inter-record TM
(native/tmalign) within two subsets:
  * "old"  — the first `--old_count` records per bucket (the exact round-4
    768-record corpus, a strict id-prefix of the extended one)
  * "full" — all records per bucket (the 3x round-5 corpus)
plus per-record SS composition (helix fraction from the P-SEA assigner,
`data/ss.py`) and the caption-level helix-count spread.

High inter-record TM within a bucket = records are near-duplicates and
corpus growth adds epochs, not information; the report makes that measured
rather than assumed. Reference context: the reference trains on ~183k real
PDBs (`/root/reference/dataset.py:77-112`) — breadth is the one part of its
setup a zero-egress environment cannot replicate, so it must be quantified.

Usage: python scripts/corpus_diversity.py [--processed data/processed_synth_n256]
         [--old_count 86] [--pairs 30] [--out reports/corpus_diversity.json]
"""

import argparse
import json
import sys
import tempfile
import time
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def bucket_records(processed: Path):
    """group record paths by length encoded in the id (synth_LLL_jjjj)."""
    buckets = defaultdict(list)
    for p in sorted(processed.glob("*.npz")):
        parts = p.stem.split("_")
        try:
            L = int(parts[1])
        except (IndexError, ValueError):
            continue
        buckets[L].append(p)
    return dict(buckets)


def tm_stats(paths, pairs, rng, pdb_cache, tmp):
    from text2protein_tpu.data.dataset import load_record
    from text2protein_tpu.data.pdbio import write_backbone_pdb
    from text2protein_tpu.eval.tmscore import run_tmalign

    def pdb_of(p):
        if p not in pdb_cache:
            rec = load_record(p)
            out = tmp / (p.stem + ".pdb")
            write_backbone_pdb(out, rec["coords"])
            pdb_cache[p] = out
        return pdb_cache[p]

    n = len(paths)
    scores = []
    seen = set()
    for _ in range(pairs * 4):
        if len(scores) >= pairs:
            break
        i, j = rng.randint(n), rng.randint(n)
        if i == j or (min(i, j), max(i, j)) in seen:
            continue
        seen.add((min(i, j), max(i, j)))
        scores.append(run_tmalign(pdb_of(paths[i]), pdb_of(paths[j])))
    scores = np.asarray(scores, np.float64)
    return {
        "pairs": int(len(scores)),
        "tm_avg": float(scores.mean()),
        "tm_std": float(scores.std()),
        "tm_min": float(scores.min()),
        "tm_max": float(scores.max()),
        "tm_p90": float(np.percentile(scores, 90)),
    }


def helix_fraction(path):
    from text2protein_tpu.data.dataset import load_record
    from text2protein_tpu.data.ss import annotate_sse

    rec = load_record(path)
    ca = np.asarray(rec["coords"], np.float64)[:, 1]  # (L, atoms, 3) -> CA
    ss = annotate_sse(ca)
    return float((np.asarray(ss) == "a").mean())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--processed", type=str,
                   default="data/processed_synth_n256")
    p.add_argument("--old_count", type=int, default=86,
                   help="records per bucket in the previous-round corpus "
                        "(id-prefix subset of the extended corpus)")
    p.add_argument("--pairs", type=int, default=30,
                   help="sampled TM pairs per bucket per subset")
    p.add_argument("--ss_sample", type=int, default=12,
                   help="records per bucket for SS composition")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="reports/corpus_diversity.json")
    args = p.parse_args()

    processed = Path(args.processed)
    buckets = bucket_records(processed)
    assert buckets, f"no synth_* records under {processed}"
    rng = np.random.RandomState(args.seed)
    t0 = time.time()

    per_bucket = {}
    ss_rows = []
    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        pdb_cache = {}
        for L in sorted(buckets):
            paths = buckets[L]
            old = paths[: args.old_count]
            row = {
                "n_old": len(old),
                "n_full": len(paths),
                "old": tm_stats(old, args.pairs, rng, pdb_cache, tmp),
                "full": tm_stats(paths, args.pairs, rng, pdb_cache, tmp),
            }
            per_bucket[str(L)] = row
            for q in rng.choice(len(paths), size=min(args.ss_sample,
                                                     len(paths)),
                                replace=False):
                ss_rows.append(helix_fraction(paths[int(q)]))
            print(f"L={L}: old tm_avg {row['old']['tm_avg']:.3f} "
                  f"full tm_avg {row['full']['tm_avg']:.3f} "
                  f"({time.time() - t0:.0f}s)")

    olds = [per_bucket[k]["old"]["tm_avg"] for k in per_bucket]
    fulls = [per_bucket[k]["full"]["tm_avg"] for k in per_bucket]
    report = {
        "processed": str(processed),
        "old_count_per_bucket": args.old_count,
        "pairs_per_bucket": args.pairs,
        "per_bucket": per_bucket,
        "summary": {
            "old_inter_record_tm_avg": float(np.mean(olds)),
            "full_inter_record_tm_avg": float(np.mean(fulls)),
            "ss_helix_fraction_avg": float(np.mean(ss_rows)),
            "ss_helix_fraction_std": float(np.std(ss_rows)),
        },
        "elapsed_s": round(time.time() - t0, 1),
    }
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report["summary"], indent=2))


if __name__ == "__main__":
    main()
