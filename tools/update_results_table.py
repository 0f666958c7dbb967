"""Regenerate the RESULTS.md round-5 zoo table between the ZOO_TABLE markers
from tools/zoo_results.jsonl + dispatch_audit.jsonl (via zoo_sweep --table)."""
import re
import subprocess
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
out = subprocess.run([sys.executable, str(HERE / "zoo_sweep.py"), "--table"],
                     capture_output=True, text=True, check=True).stdout.strip()
res = HERE.parent / "RESULTS.md"
text = res.read_text()
new = re.sub(r"(<!-- ZOO_TABLE_START -->\n).*?(<!-- ZOO_TABLE_END -->)",
             r"\1" + out + "\n" + r"\2", text, flags=re.S)
res.write_text(new)
print("table updated:", len(out.splitlines()), "lines")
