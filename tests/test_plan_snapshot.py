"""PLANS.md guard (round-9 verdict task 5): the committed plan-snapshot
artifact must cover every headline query, contain zero CartesianProduct
rows, and show python stages only on the declared whitelist (media
codec boundary + pandas-UDF surfaces).  A query that gains a cartesian
or an undeclared python stage fails here the moment PLANS.md is
regenerated; a NEW headline query without a row fails immediately.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, "/root/repo")

PLANS = "/root/repo/PLANS.md"


def _rows():
    assert os.path.exists(PLANS), "PLANS.md missing — run tools/plan_snapshot.py"
    rows = {}
    with open(PLANS) as f:
        for line in f:
            m = re.match(r"\| (\w+) \| (\d+) \| (.*) \| (\d+) \|$", line.strip())
            if m:
                rows[m.group(1)] = {
                    "exchanges": int(m.group(2)),
                    "joins": m.group(3),
                    "python": int(m.group(4)),
                }
    return rows


def test_plans_cover_every_headline_query():
    from bench import HEADLINE

    rows = _rows()
    missing = [n for n in HEADLINE if n not in rows]
    assert not missing, (
        f"headline queries without a PLANS.md row (regenerate with "
        f"tools/plan_snapshot.py): {missing}"
    )


def test_no_cartesian_products():
    rows = _rows()
    offenders = [n for n, r in rows.items() if "CartesianProduct" in r["joins"]]
    assert not offenders, f"CartesianProduct in plans: {offenders}"


def test_python_stages_only_on_whitelist():
    from tools.plan_snapshot import PYTHON_WHITELIST

    rows = _rows()
    offenders = [
        n for n, r in rows.items() if r["python"] > 0 and n not in PYTHON_WHITELIST
    ]
    assert not offenders, (
        f"undeclared python stages (add a JVM-side form or whitelist with "
        f"justification): {offenders}"
    )
