"""Summarize /tmp/chip_matrix/*.log into one table: every bench JSON line,
per-step exit codes, and verify-script pass/fail. Run after
exps/run_on_chip_matrix.sh finishes (or mid-run for partial results)."""

import json
import os
import re
import sys

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/chip_matrix"


def main():
    summary = os.path.join(OUT, "summary.log")
    exits = {}
    if os.path.exists(summary):
        for line in open(summary):
            m = re.match(r"=== (\S+) exit (\d+)", line)
            if m:
                exits[m.group(1)] = int(m.group(2))
    print(f"{'step':28s} {'exit':>4s}  result")
    for name in sorted(os.listdir(OUT)):
        if not name.endswith(".log") or name == "summary.log":
            continue
        step = name[:-4]
        code = exits.get(step, "?")
        rows = []
        for line in open(os.path.join(OUT, name), errors="replace"):
            line = line.strip()
            if line.startswith("{") and '"metric"' in line:
                try:
                    j = json.loads(line)
                    rows.append(
                        f"{j.get('metric','?')}: {j.get('value')} "
                        f"{j.get('unit','')} (vs {j.get('vs_baseline')})"
                        + (f" p50 {j['p50_ttft_ms']}ms"
                           if 'p50_ttft_ms' in j else ""))
                except json.JSONDecodeError:
                    pass
            elif re.search(r"PASS|FAIL|OK|max\|", line):
                rows.append(line[:110])
        first = rows[0] if rows else "(no output parsed)"
        print(f"{step:28s} {code!s:>4s}  {first}")
        for r in rows[1:]:
            print(f"{'':34s}{r}")


if __name__ == "__main__":
    main()
