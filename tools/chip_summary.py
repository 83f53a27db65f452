"""Distill /tmp/chip_queue.log into CHIP_RESULTS_r03.md.

The chip backlog (tools/chip_queue.sh) appends every step's raw output to
one log. This extracts the durable evidence — step exit codes, every JSON
metric line, SMOKE verdicts, A/B tables, and the jacobi compile table —
into a committed artifact so the results survive even if the log is lost.

Usage: python tools/chip_summary.py [logfile] [outfile]
"""

import json
import re
import sys


def main():
    log = sys.argv[1] if len(sys.argv) > 1 else "/tmp/chip_queue.log"
    out = sys.argv[2] if len(sys.argv) > 2 else "CHIP_RESULTS_r03.md"
    try:
        text = open(log, errors="replace").read()
    except OSError as e:
        print(f"no log: {e}", file=sys.stderr)
        return 1

    lines = text.splitlines()
    steps = []  # (name, exit)
    jsons = []
    extras = []
    cur = None
    for ln in lines:
        m = re.match(r"=== \[(\d+)\] (\S+) \((\S+)\) ===", ln)
        if m:
            cur = m.group(2)
            continue
        m = re.match(r"=== \[(\d+)\] (\S+) exit=(\d+) ===", ln)
        if m:
            steps.append((m.group(2), int(m.group(3))))
            continue
        s = ln.strip()
        if s.startswith("{") and s.endswith("}"):
            try:
                obj = json.loads(s)
            except ValueError:
                continue
            if isinstance(obj, dict):
                jsons.append((cur, s))
            continue
        if (
            s.startswith("SMOKE ")
            or s.startswith("| ")
            or "PASS" in s
            or "FAIL" in s
            or re.match(r"n=\d+:", s)
        ):
            extras.append((cur, s))

    with open(out, "w") as f:
        f.write("# Chip backlog results (auto-extracted)\n\n")
        f.write("Source: tools/chip_queue.sh run, log /tmp/chip_queue.log.\n\n")
        f.write("## Step exits\n\n")
        for name, rc in steps:
            f.write(f"- `{name}`: exit {rc}\n")
        f.write("\n## Metric lines\n\n")
        last_step = None
        for step, s in jsons:
            if step != last_step:
                f.write(f"\n### {step}\n\n")
                last_step = step
            f.write(f"    {s}\n")
        f.write("\n## Verdicts / tables\n\n")
        last_step = None
        for step, s in extras:
            if step != last_step:
                f.write(f"\n### {step}\n\n")
                last_step = step
            f.write(f"    {s}\n")
    print(f"wrote {out}: {len(steps)} steps, {len(jsons)} metric lines")
    return 0


if __name__ == "__main__":
    sys.exit(main())
