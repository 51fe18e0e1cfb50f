"""Unattended hardware measurement battery: run the moment the TPU tunnel
is back, logs everything to one file. Each step runs in its own
subprocess with a timeout so a wedged step can't eat the session, and the
log survives a dropped tunnel mid-battery.

Steps (NOTES_NEXT_ROUND.md hardware queue):
  1. bench.py            — the three driver metrics
  2. ppm phase split     — ganesha + cornell sync/async attribution
  3. knob sweep          — compact x chains at the canonical config

Usage: python tools/hw_session.py [logfile]  (default /tmp/hw_session.log)
"""
import subprocess
import sys
import time

STEPS = [
    ("bench", [sys.executable, "bench.py"], 1800),
    ("ppm-phases-ganesha",
     [sys.executable, "-m", "tools.proto_ppm_iter_phases", "ganesha", "3"],
     1800),
    ("ppm-phases-cornell",
     [sys.executable, "-m", "tools.proto_ppm_iter_phases", "cornell", "3"],
     1200),
    ("knob-sweep",
     [sys.executable, "tools/sweep_knobs.py", "3|1;3|2;2,4|1;2,4|2"], 1800),
]


def main():
    log_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hw_session.log"
    with open(log_path, "a") as log:
        def say(msg):
            line = f"[{time.strftime('%H:%M:%S')}] {msg}"
            print(line, flush=True)
            log.write(line + "\n")
            log.flush()

        say("=== hardware session start ===")
        for name, cmd, tout in STEPS:
            say(f"--- {name}: {' '.join(cmd)} (timeout {tout}s)")
            t0 = time.monotonic()
            try:
                res = subprocess.run(cmd, capture_output=True, text=True,
                                     timeout=tout)
                say(f"{name} rc={res.returncode} "
                    f"({time.monotonic() - t0:.0f}s)")
                log.write(res.stdout + "\n--- stderr ---\n"
                          + res.stderr[-4000:] + "\n")
                log.flush()
            except subprocess.TimeoutExpired as e:
                say(f"{name} TIMEOUT after {tout}s")
                log.write((e.stdout or "")[-4000:] + "\n")
                log.flush()
        say("=== hardware session done ===")


if __name__ == "__main__":
    main()
