#!/usr/bin/env python
"""Local CI mirror — the analog of binaries/precommit-check
(/root/reference/binaries/precommit-check/src/main.rs: check/test/fmt/doc/clippy).

Runs: byte-compile check, import check, pytest, harness smoke.
"""

import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def run(name, cmd):
    print(f"==> {name}: {' '.join(cmd)}")
    r = subprocess.run(cmd, cwd=ROOT)
    if r.returncode != 0:
        print(f"FAILED: {name}")
        sys.exit(r.returncode)


run("compile", [sys.executable, "-m", "compileall", "-q", "llm_tpu", "tests"])
run("import", [sys.executable, "-c", "import llm_tpu, llm_tpu.cli"])
run("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"])
run("harness", [sys.executable, "-m", "llm_tpu.harness", "llama"])
print("precommit OK")
