"""ODE NFE quality sweep (VERDICT r2 #6): locate the quality knee.

Runs the quality loop on one shared checkpoint at several ODE step counts
(NFE ~= 2*steps + final churn) plus the 1000-step PC chain reference, then
writes a single TM-vs-NFE table. The deployment default in
`get_sampling_fn` should sit at the knee (TM within ~3% of the PC chain).

Usage:
  python scripts/sweep_ode_nfe.py --workdir training/quality_text/<stamp>
      [--steps 50,100,200,400] [--num_designs 32]
"""

import argparse
import json
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", type=str, required=True)
    p.add_argument("--steps", type=str, default="50,100,200,400")
    p.add_argument("--num_designs", type=int, default=32)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--pc_steps", type=int, default=1000)
    p.add_argument("--out", type=str, default="reports/ode_nfe_sweep.json")
    args = p.parse_args()

    here = Path(__file__).parent
    rows = []

    def run(sampler, steps, tag):
        out = Path(f"reports/_sweep_{tag}.json")
        cmd = [
            sys.executable, str(here / "quality_loop.py"),
            "--workdir", args.workdir, "--sampler", sampler,
            "--steps", str(steps), "--num_designs", str(args.num_designs),
            "--batch", str(args.batch), "--out", str(out),
        ]
        print("==>", " ".join(cmd), flush=True)
        subprocess.run(cmd, check=True)
        r = json.load(open(out))
        rows.append({
            "sampler": sampler,
            "steps": steps,
            "nfe": r["nfe"],
            "tm_avg": r["tm_gt"]["tm_avg"],
            "tm_min": r["tm_gt"]["tm_min"],
            "gt50": r["tm_gt"]["gt50"],
            "lt30": r["tm_gt"]["lt30"],
            "mse_avg": r["mse_6d"]["avg"],
            "energy_avg": r["realization_energy"]["avg"],
            "energy_median": r["realization_energy"]["median"],
            "flagged": r["realization_energy"]["flagged_high_energy"],
            "sample_time_s": r["sample_time_s"],
        })

    run("pc", args.pc_steps, f"pc{args.pc_steps}")
    for s in [int(x) for x in args.steps.split(",")]:
        run("ode", s, f"ode{s}")

    pc_tm = rows[0]["tm_avg"]
    for r in rows:
        r["tm_vs_pc"] = round(r["tm_avg"] / pc_tm, 4) if pc_tm else None
    knee = next(
        (r for r in rows[1:] if r["tm_vs_pc"] and r["tm_vs_pc"] >= 0.97),
        None,
    )
    report = {
        "workdir": args.workdir,
        "rows": rows,
        "knee": knee and {"steps": knee["steps"], "nfe": knee["nfe"]},
    }
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
