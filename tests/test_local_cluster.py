"""Multi-executor smoke: the build runs on local-cluster (separate
executor JVMs + python workers), catching closure-capture/serialization
bugs that local[*] (single shared JVM) hides. Runs via subprocess so the
cluster master doesn't collide with the session fixture's context."""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_build_on_separate_executor_jvms():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "exp_scale.py"),
         "4", "400", "2"],
        capture_output=True, text=True, timeout=600, check=True,
        env=dict(os.environ, EXP_CLUSTER="2,2", EXP_MODE="bulk"),
    )
    m = re.search(r"postings=(\d+)", out.stdout)
    assert m, f"no RESULT line in: {out.stdout[-800:]}"
    assert int(m.group(1)) > 0
