"""Assemble a training-curve report JSON from a workdir's metrics.jsonl.

Produces the schema of reports/train_n256_curve.json (eval-loss milestones +
throughput + wall time) from the MetricsWriter JSONL stream, so the
round-end evidence artifact is one command:

  python scripts/assemble_curve.py --workdir training/quality_n256/r3 \
      --out reports/train_n256_curve_r3.json --what "..."
"""

import argparse
import json
from pathlib import Path


def assemble(workdir: Path, what: str = "") -> dict:
    rows = []
    with open(workdir / "tb" / "metrics.jsonl") as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    train = [r for r in rows if r["tag"] == "training_loss"]
    evals = [r for r in rows if r["tag"] == "avg_eval_loss"]
    if not train:
        raise SystemExit(f"no training_loss rows in {workdir}")
    steps = max(r["step"] for r in train)
    # throughput from the logged span (robust to resume gaps: use the
    # longest contiguous stretch between consecutive log rows < 10 min)
    spans, last = [], None
    for r in train:
        if last is not None and 0 < r["time"] - last["time"] < 600:
            spans.append((r["step"] - last["step"], r["time"] - last["time"]))
        last = r
    d_steps = sum(s for s, _ in spans)
    d_time = sum(t for _, t in spans)
    wall_h = (train[-1]["time"] - train[0]["time"]) / 3600.0
    cfg = (workdir / "config.yml").read_text()
    batch = None
    for ln in cfg.splitlines():
        if "batch_size:" in ln:
            batch = int(ln.split(":")[1])
            break
    report = {
        "what": what or f"training curve for {workdir}",
        "workdir": str(workdir),
        "steps_completed": int(steps),
        "wall_hours": round(wall_h, 2),
        "throughput_samples_per_sec": (
            round(d_steps / d_time * (batch or 1), 2) if d_time else None
        ),
        "eval_curve": [
            {"step": int(r["step"]), "avg_eval_loss": round(r["value"], 5)}
            for r in evals
        ],
        "final_training_loss": round(train[-1]["value"], 5),
    }
    return report


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--what", default="")
    args = p.parse_args()
    report = assemble(Path(args.workdir), args.what)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
