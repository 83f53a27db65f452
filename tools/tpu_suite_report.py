"""Run the full test suite on the real TPU chip and write TPU_SUITE_r05.md
with a per-cause skip census (VERDICT r2 item 6).

Skips are attributed by reason string:
  * chip-capability: complex dtypes (runtime-inherent; split-real twins
    cover the semantics on chip — tests/test_split_real_twins.py)
  * chip-capability: FFT (runtime-inherent; split-real DFT operators
    cover the semantics on chip)
  * multi-device (the chip is a single device; the virtual 8-device CPU
    mesh covers these)
  * anything else, listed verbatim

Usage: python tools/tpu_suite_report.py    (must be the ONLY chip user)
"""

import os
import re
import subprocess
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    env = dict(os.environ)
    env["RLS_TPU_TEST_PLATFORM"] = "tpu"
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", "-rs"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
    )
    out = proc.stdout
    # keep the full run log — the markdown is a summary, not the record
    with open(os.path.join(REPO, ".tpu_suite_r05_full.log"), "w") as f:
        f.write(out + "\n--- stderr ---\n" + proc.stderr)
    tail = out.strip().splitlines()[-1] if out.strip() else ""
    reasons = Counter()
    for m in re.finditer(
        r"^SKIPPED \[(\d+)\] [^:]+?(?::\d+)?: (.+)$", out, re.M
    ):
        reasons[m.group(2).strip()] += int(m.group(1))
    failures = re.findall(r"^FAILED (\S+)", out, re.M)
    # collapse to causes
    causes = Counter()
    for reason, n in reasons.items():
        if "complex" in reason:
            causes["complex dtypes (runtime-inherent)"] += n
        elif "FFT" in reason:
            causes["FFT (runtime-inherent)"] += n
        elif "multi-device" in reason:
            causes["multi-device (single-chip run)"] += n
        else:
            causes[reason] += n

    lines = [
        "# TPU suite run — round 5",
        "",
        "Full suite under `RLS_TPU_TEST_PLATFORM=tpu` on the tunneled",
        "v5e chip (single device).",
        "",
        f"**Result line**: `{tail}`",
        "",
        "## Skip census (by cause)",
        "",
        "| cause | count |",
        "|---|---|",
    ]
    for cause, n in causes.most_common():
        lines.append(f"| {cause} | {n} |")
    lines += [
        "",
        "Complex/FFT skips are capability-inherent to this runtime (a",
        "complex transfer poisons the session — docs/tpu.md). Their",
        "SEMANTICS run on chip through the split-real twins",
        "(tests/test_split_real_twins.py) and the split-real DFT/SENSE",
        "operator tests. Multi-device tests run on the virtual 8-device",
        "CPU mesh (tests/test_sharding.py) and the 2-process",
        "jax.distributed test (tests/test_multiprocess.py).",
        "",
        "## Raw skip reasons",
        "",
    ]
    for reason, n in reasons.most_common():
        lines.append(f"- {n} x {reason}")
    if failures:
        lines += ["", "## Failures", ""]
        for f_ in failures:
            lines.append(f"- {f_}")
    md = "\n".join(lines) + "\n"
    path = os.path.join(REPO, "TPU_SUITE_r05.md")
    with open(path, "w") as f:
        f.write(md)
    print(md)
    print(f"wrote {path}", file=sys.stderr)
    if proc.returncode != 0:
        print(out[-4000:], file=sys.stderr)
        sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
