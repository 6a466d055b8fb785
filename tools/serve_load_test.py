"""Load-test the HTTP serving endpoint and record SERVE_LOAD.json.

Answers the question the bench harness can't: what does the PRODUCTION
stack (HTTP parse -> queue/lock -> pipeline -> PNG encode -> socket)
cost on top of the raw denoise+decode p50 that bench.py reports, and
what does it sustain end-to-end? Evidence for the serving story
(README/PERF.md cite the result); the reference has no serving endpoint
to compare against.

Usage (self-launching, the default):
  python tools/serve_load_test.py --model /tmp/f7b --quantize \
      [--requests 6] [--width 1024 --height 1024 --steps 30] \
      [--no_text_encoder] [--out SERVE_LOAD.json]

Or against an already-running server: --url http://127.0.0.1:8080

The self-launched server runs `python -m f_lite_tpu.serve --http_port`
as a subprocess on whatever backend the environment provides (the real
TPU by default; prefix with the CPU-mesh env for a hermetic smoke run)
and is killed by PID afterwards. Startup (checkpoint load + quantize +
warmup compile) is reported separately as `startup_s` — with the
persistent compilation cache warm, it is dominated by the weight load.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
import urllib.error
import urllib.request
from pathlib import Path


def wait_healthy(url: str, timeout_s: float, proc=None) -> float:
    t0 = time.perf_counter()
    deadline = t0 + timeout_s
    while time.perf_counter() < deadline:
        if proc is not None and proc.poll() is not None:
            # fail NOW on a crashed server instead of polling out the
            # full (multi-minute) startup timeout
            raise SystemExit(
                f"server exited with code {proc.returncode} during "
                "startup — see /tmp/serve_load_server.log"
            )
        try:
            with urllib.request.urlopen(url + "/healthz", timeout=10):
                return time.perf_counter() - t0
        except (urllib.error.URLError, ConnectionError, OSError):
            time.sleep(2.0)
    raise SystemExit(f"server not healthy within {timeout_s:.0f}s")


def post_generate(url: str, body: dict, timeout_s: float):
    req = urllib.request.Request(
        url + "/generate", data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    t0 = time.perf_counter()
    with urllib.request.urlopen(req, timeout=timeout_s) as resp:
        png = resp.read()
        dev = float(resp.headers.get("X-F-Lite-Seconds", "nan"))
    return time.perf_counter() - t0, dev, len(png)


def pctl(xs, q):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(len(xs) * q))]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None,
                    help="checkpoint dir; launches the server as a "
                         "subprocess (omit with --url)")
    ap.add_argument("--url", default=None,
                    help="already-running server to test instead")
    ap.add_argument("--port", type=int, default=8199)
    ap.add_argument("--requests", type=int, default=6)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--quantize", action="store_true")
    ap.add_argument("--no_text_encoder", action="store_true")
    ap.add_argument("--startup_timeout", type=float, default=2400.0)
    ap.add_argument("--request_timeout", type=float, default=600.0)
    ap.add_argument("--bench_p50", type=float, default=None,
                    help="bench.py's raw p50 s/image for the same config "
                         "(the overhead comparison in the artifact)")
    ap.add_argument("--out", default="SERVE_LOAD.json")
    args = ap.parse_args()
    if (args.model is None) == (args.url is None):
        raise SystemExit("pass exactly one of --model or --url")

    proc = None
    startup_s = None
    url = args.url
    try:
        if args.model:
            cmd = [
                sys.executable, "-m", "f_lite_tpu.serve",
                "--model", args.model,
                "--http_port", str(args.port),
                "--width", str(args.width), "--height", str(args.height),
                "--steps", str(args.steps),
            ]
            if args.quantize:
                cmd.append("--quantize")
            if args.no_text_encoder:
                cmd.append("--no_text_encoder")
            log = open("/tmp/serve_load_server.log", "w")
            proc = subprocess.Popen(cmd, stdout=log, stderr=log)
            url = f"http://127.0.0.1:{args.port}"
            startup_s = wait_healthy(url, args.startup_timeout, proc=proc)
        else:
            wait_healthy(url, 30.0)

        walls, devs = [], []
        t_run = time.perf_counter()
        for i in range(args.requests):
            wall, dev, nbytes = post_generate(url, {
                "prompt": f"a lighthouse in a storm, variant {i}",
                "seed": i,
            }, args.request_timeout)
            walls.append(wall)
            devs.append(dev)
            print(f"request {i}: {wall:.2f}s wall, {dev:.2f}s device, "
                  f"{nbytes} B png", flush=True)
        sustained_wall = time.perf_counter() - t_run

        p50_wall, p50_dev = pctl(walls, 0.5), pctl(devs, 0.5)
        record = {
            "requests": args.requests,
            "width": args.width, "height": args.height,
            "steps": args.steps, "quantize": bool(args.quantize),
            "text_encoder": not args.no_text_encoder,
            "startup_s": round(startup_s, 1) if startup_s else None,
            "p50_wall_s": round(p50_wall, 3),
            "p95_wall_s": round(pctl(walls, 0.95), 3),
            "p50_device_s": round(p50_dev, 3),
            "http_overhead_p50_ms": round((p50_wall - p50_dev) * 1e3, 1),
            "sustained_images_per_min": round(
                60.0 * args.requests / sustained_wall, 3
            ),
            "bench_p50_s": args.bench_p50,
            "overhead_vs_bench_ms": (
                round((p50_wall - args.bench_p50) * 1e3, 1)
                if args.bench_p50 else None
            ),
        }
        Path(args.out).write_text(json.dumps(record, indent=2))
        print(json.dumps(record))
    finally:
        if proc is not None:
            proc.terminate()
            try:
                proc.wait(timeout=30)
            except subprocess.TimeoutExpired:
                proc.kill()


if __name__ == "__main__":
    main()
