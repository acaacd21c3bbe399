"""Multi-process (multi-host scaffold) dry run — SURVEY.md §5's
"Distributed communication backend" item, proven with N local CPU
processes under a jax.distributed coordination service (see
columnflow/parallel/multihost.py for what each worker verifies: a
process-spanning mesh, a GSPMD-all-reduced DP gradient step matching the
single-host reference, a TP-sharded matmul, and an explicit cross-process
psum).

    python tools/dryrun_multihost.py --processes 2 --local-devices 4

Exit 0 iff every worker verified its checks; degrades gracefully (clear
message, exit 2) if the environment blocks subprocess networking.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--processes", type=int, default=2)
    p.add_argument("--local-devices", type=int, default=4)
    p.add_argument("--timeout", type=float, default=600.0)
    args = p.parse_args()

    coordinator = f"localhost:{free_port()}"
    env = dict(os.environ)
    # Set platform/device-count BEFORE the worker interpreter starts
    # (advisor, round 4): the worker imports the columnflow package —
    # which imports jax — before its own env mutation would run, so any
    # future import-time jnp constant would otherwise initialize the
    # backend with the wrong device count.
    env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                        f"{args.local_devices}")
    env["JAX_PLATFORMS"] = "cpu"
    procs = []
    try:
        for i in range(args.processes):
            procs.append(subprocess.Popen(
                [sys.executable, "-m", "columnflow.parallel.multihost",
                 "--process-id", str(i),
                 "--num-processes", str(args.processes),
                 "--coordinator", coordinator,
                 "--local-devices", str(args.local_devices)],
                cwd=REPO, env=env, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True))
        outs = []
        for pr in procs:
            try:
                out, _ = pr.communicate(timeout=args.timeout)
            except subprocess.TimeoutExpired:
                pr.kill()
                out, _ = pr.communicate()
            outs.append((pr.returncode, out))
    except OSError as e:
        print(f"multihost dryrun: environment blocks multi-process "
              f"launch ({e}); skipping gracefully", file=sys.stderr)
        sys.exit(2)

    results = []
    for rc, out in outs:
        rec = None
        for line in out.splitlines():
            if line.startswith("MULTIHOST_RESULT "):
                rec = json.loads(line[len("MULTIHOST_RESULT "):])
        results.append((rc, rec))
        if rc != 0 or rec is None:
            print(out[-2000:], file=sys.stderr)

    ok = all(rc == 0 and rec and rec["ok"] for rc, rec in results)
    summary = {
        "processes": args.processes,
        "local_devices": args.local_devices,
        "global_devices": args.processes * args.local_devices,
        "workers": [rec for _, rec in results],
        "ok": ok,
    }
    print(json.dumps(summary))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
