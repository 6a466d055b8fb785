"""Per-chip HBM fit audit for flagship training/serving programs.

VERDICT r2 item 3: memory is the known binding constraint (a 7B batch-8
single-chip training try OOMed by 13.9 GB — PERF.md), the reference's
whole distributed design exists to make training fit
(`/root/reference/f_lite/distributed.py:83-100`), and XLA's
`memory_analysis()` on the AOT-compiled SPMD program gives exact per-chip
argument/output bytes (plus XLA's temp accounting) for free.

This tool sweeps the 10B training recipe over candidate meshes and the
7B/10B tp8 serving programs, each in a fresh subprocess (the virtual CPU
device count is fixed at backend init), collecting the `memory` field the
compile-check tools now emit. Writes MEM_CHECK.json and prints the
markdown table PERF.md carries.

Run: python tools/memory_audit.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import tempfile
from pathlib import Path

TOOLS = Path(__file__).resolve().parent

# (label, n_devices, mesh, batch, microbatches) — batch = 2 samples per
# (dp x fsdp) column so per-chip work is constant across meshes
TRAIN_MESHES = [
    ("fsdp8",            dict(dp=1, pp=1, fsdp=8, tp=1)),
    ("fsdp4_tp2",        dict(dp=1, pp=1, fsdp=4, tp=2)),
    ("pp2_fsdp2_tp2",    dict(dp=1, pp=2, fsdp=2, tp=2)),
    ("fsdp8_tp2",        dict(dp=1, pp=1, fsdp=8, tp=2)),
    ("pp2_fsdp4_tp2",    dict(dp=1, pp=2, fsdp=4, tp=2)),
    ("fsdp16_tp2",       dict(dp=1, pp=1, fsdp=16, tp=2)),
    ("pp2_fsdp8_tp2",    dict(dp=1, pp=2, fsdp=8, tp=2)),
]

SERVE_PROGRAMS = [
    ("7b_tp8", ["--model", "7b", "--tp", "8"]),
    ("10b_tp8", ["--model", "10b", "--tp", "8"]),
]


def run_one(cmd: list[str], out_file: Path) -> dict:
    """One compile-check subprocess -> its JSON record, or an error
    record (never an exception): a single slow/failed mesh must not
    abort the sweep and discard hours of completed compiles."""
    try:
        proc = subprocess.run(
            [sys.executable, *cmd], capture_output=True, text=True,
            timeout=1800,
        )
    except subprocess.TimeoutExpired:
        return {"ok": False, "error": "timeout after 1800s"}
    if out_file.exists():
        return json.loads(out_file.read_text())
    return {
        "ok": False,
        "error": (f"no output; rc={proc.returncode}\n"
                  f"{proc.stdout[-1000:]}\n{proc.stderr[-1000:]}"),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="tiny model smoke (used by the test suite)")
    ap.add_argument("--model", default="10b", choices=("7b", "10b"))
    ap.add_argument("--out", default="MEM_CHECK.json")
    args = ap.parse_args()

    tmp = Path(tempfile.mkdtemp(prefix="memaudit_"))
    records = {"training": [], "serving": []}

    meshes = TRAIN_MESHES[:3] if args.quick else TRAIN_MESHES
    for label, mesh in meshes:
        n = mesh["dp"] * mesh["pp"] * mesh["fsdp"] * mesh["tp"]
        batch = 2 * mesh["dp"] * mesh["fsdp"]
        mb = 2 if mesh["pp"] > 1 else 1
        out_file = tmp / f"train_{label}.json"
        cmd = [
            str(TOOLS / "pp_compile_check.py"),
            "--dp", str(mesh["dp"]), "--pp", str(mesh["pp"]),
            "--fsdp", str(mesh["fsdp"]), "--tp", str(mesh["tp"]),
            "--model", args.model, "--batch", str(batch),
            "--microbatches", str(mb), "--out", str(out_file),
        ] + (["--tiny"] if args.quick else [])
        print(f"[train {label}] n={n} batch={batch} ...", flush=True)
        rec = run_one(cmd, out_file)
        rec["label"], rec["n_devices"] = label, n
        records["training"].append(rec)
        Path(args.out).write_text(json.dumps(records, indent=2))  # flush
        m = rec.get("memory") or {}
        print(f"  peak {m.get('per_chip_peak_gb')} GB/chip "
              f"(args {m.get('per_chip_args_gb')}, temps "
              f"{m.get('per_chip_temps_gb')}) fits={m.get('fits_budget')}",
              flush=True)

    for label, extra in (SERVE_PROGRAMS if not args.quick else
                         [("tiny_tp4", ["--tiny", "--tp", "4",
                                        "--steps", "4"])]):
        out_file = tmp / f"serve_{label}.json"
        cmd = [str(TOOLS / "tp_compile_check.py"), "--out", str(out_file),
               *extra]
        print(f"[serve {label}] ...", flush=True)
        rec = run_one(cmd, out_file)
        rec["label"] = label
        records["serving"].append(rec)
        Path(args.out).write_text(json.dumps(records, indent=2))  # flush
        m = rec.get("memory") or {}
        print(f"  peak {m.get('per_chip_peak_gb')} GB/chip "
              f"fits={m.get('fits_budget')}", flush=True)

    fitting = [
        r for r in records["training"]
        if (r.get("memory") or {}).get("fits_budget")
    ]
    records["min_training_pod"] = (
        min((r["n_devices"] for r in fitting), default=None)
    )
    records["model"] = "tiny" if args.quick else f"f-lite-{args.model}"
    Path(args.out).write_text(json.dumps(records, indent=2))

    # markdown table for PERF.md
    print("\n| mesh | chips | batch | args GB/chip | temps GB/chip | "
          "peak GB/chip | fits 16 GB |")
    print("|---|---|---|---|---|---|---|")
    for r in records["training"]:
        m = r.get("memory") or {}
        print(f"| {r['label']} | {r['n_devices']} | {r['batch']} | "
              f"{m.get('per_chip_args_gb')} | {m.get('per_chip_temps_gb')} "
              f"| {m.get('per_chip_peak_gb')} | "
              f"{'yes' if m.get('fits_budget') else 'NO'} |")
    for r in records["serving"]:
        m = r.get("memory") or {}
        print(f"| serve {r['label']} | {r['tp']} | 1 | "
              f"{m.get('per_chip_args_gb')} | {m.get('per_chip_temps_gb')} "
              f"| {m.get('per_chip_peak_gb')} | "
              f"{'yes' if m.get('fits_budget') else 'NO'} |")
    print(f"\nminimum pod for {records['model']} training: "
          f"{records['min_training_pod']} chips")


if __name__ == "__main__":
    main()
