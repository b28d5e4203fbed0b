from __future__ import annotations

import ast
import os
import re
from pathlib import Path

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

REFERENCE_DIR = Path("/root/reference")
TESTDATA = Path(os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"))


@pytest.fixture(scope="session")
def spark():
    from gduns_name_match_spark.session import get_spark

    s = get_spark(app_name="gduns-tests", shuffle_partitions=8)
    yield s


def load_reference_functions(*names: str, module: str = "automation_final2.py"):
    """Exec the reference's own pure normalization functions for parity tests.

    We never copy reference code into the repo; at test time we parse the
    (read-only, untrusted) file with ast, extract only the requested pure
    string functions, and exec them in a namespace containing just `re`.
    Skips cleanly when /root/reference is absent.
    """
    path = REFERENCE_DIR / module
    if not path.exists():
        pytest.skip(f"reference file {path} not available")
    src = path.read_text(errors="replace")
    tree = ast.parse(src)
    ns: dict = {"re": re}
    found = {}
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in names:
            seg = ast.get_source_segment(src, node)
            exec(compile(seg, str(path), "exec"), ns)  # noqa: S102
            found[node.name] = ns[node.name]
    missing = set(names) - set(found)
    if missing:
        pytest.skip(f"reference functions {missing} not found in {module}")
    return found
