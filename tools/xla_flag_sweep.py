"""Sweep XLA TPU compiler flags over the flagship forward (perf_probe method).

Runs tools/perf_probe.py in a fresh subprocess per flag set (XLA_FLAGS is
read once at backend init) and reports ms/forward for each. Used to verify
whether any documented xla_tpu knob moves the conv-dominated UNet forward
(BASELINE.md roofline section records the outcome).

Usage: python tools/xla_flag_sweep.py [batch]
"""

import os
import subprocess
import sys

BATCH = sys.argv[1] if len(sys.argv) > 1 else "64"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FLAG_SETS = {
    "baseline": "",
    "latency_hiding": "--xla_tpu_enable_latency_hiding_scheduler=true",
    "vmem_64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "vmem_96m": "--xla_tpu_scoped_vmem_limit_kib=98304",
    "no_rwb_fusion": "--xla_tpu_rwb_fusion=false",
    "aggressive_fusion": (
        "--xla_tpu_enable_aggressive_broadcast_priority_update=true"
    ),
    "async_fusion_off": "--xla_tpu_enable_async_collective_fusion=false",
    "vmem_64m+latency": (
        "--xla_tpu_scoped_vmem_limit_kib=65536 "
        "--xla_tpu_enable_latency_hiding_scheduler=true"
    ),
}


def main():
    for name, flags in FLAG_SETS.items():
        env = dict(os.environ)
        base = env.get("XLA_FLAGS", "")
        env["XLA_FLAGS"] = (base + " " + flags).strip()
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "perf_probe.py"),
             BATCH],
            env=env, capture_output=True, text=True, timeout=900,
        )
        line = [l for l in proc.stdout.splitlines() if "ms/fwd" in l]
        status = line[0].strip() if line else f"FAILED rc={proc.returncode}"
        if not line and proc.stderr:
            status += " | " + proc.stderr.strip().splitlines()[-1][:120]
        print(f"{name:20s} {status}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
