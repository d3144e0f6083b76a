"""Doc-drift gate: the query counts stated in README/ARCHITECTURE must
match the live __spark_entry__ contract (regenerate with
``python tools/update_counts.py``)."""

import subprocess
import sys


def test_doc_query_counts_in_sync():
    proc = subprocess.run(
        [sys.executable, "tools/update_counts.py", "--check"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, (
        f"doc counts drifted from __spark_entry__ "
        f"(run tools/update_counts.py): {proc.stdout} {proc.stderr}"
    )
