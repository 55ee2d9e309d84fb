"""PLANS.md guard (round-9 verdict task 5, extended round 13): the
committed plan-snapshot artifact must cover every headline query,
contain zero CartesianProduct rows, show python stages only on the
declared whitelist (media codec boundary + pandas-UDF surfaces), and
show GLOBAL (unpartitioned) Window nodes only on the declared
whitelist, where every entry states the bound that keeps its
SinglePartition sort safe at scale.  A query that gains a cartesian,
an undeclared python stage, or an undeclared global window fails here
the moment PLANS.md is regenerated; a NEW headline query without a row
fails immediately.
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
            m = re.match(
                r"\| (\w+) \| (\d+) \| (.*) \| (\d+) \| (\d+) \|$",
                line.strip(),
            )
            if m:
                rows[m.group(1)] = {
                    "exchanges": int(m.group(2)),
                    "joins": m.group(3),
                    "python": int(m.group(4)),
                    "global_windows": int(m.group(5)),
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


def test_global_windows_only_on_whitelist():
    """Round-12 verdict task 4: the 'every global window is over an
    already-bounded frame' invariant, previously a session-audit note,
    is now a committed gate — a future query can't ship a
    SinglePartition sort over a raw corpus silently."""
    from tools.plan_snapshot import GLOBAL_WINDOW_WHITELIST

    rows = _rows()
    offenders = [
        n
        for n, r in rows.items()
        if r["global_windows"] > 0 and n not in GLOBAL_WINDOW_WHITELIST
    ]
    assert not offenders, (
        f"undeclared global (unpartitioned) windows — partition the "
        f"window, or whitelist with the bound that keeps the "
        f"SinglePartition sort safe: {offenders}"
    )
    # every whitelist entry states its bound (non-empty rationale)
    empty = [k for k, v in GLOBAL_WINDOW_WHITELIST.items() if not v.strip()]
    assert not empty, f"whitelist entries without a declared bound: {empty}"


def test_count_global_windows_parser():
    """The plan-line parser distinguishes partitioned from global
    Window nodes (real Spark 4 plan-line shapes)."""
    from tools.plan_snapshot import count_global_windows

    part = (
        "+- Window [row_number() windowspecdefinition(g#3L, id#2L ASC "
        "NULLS FIRST, specifiedwindowframe(RowFrame, "
        "unboundedpreceding$(), currentrow$())) AS rk#4], [g#3L], "
        "[id#2L ASC NULLS FIRST]"
    )
    glob = (
        "+- Window [row_number() windowspecdefinition(id#2L ASC NULLS "
        "FIRST, specifiedwindowframe(RowFrame, unboundedpreceding$(), "
        "currentrow$())) AS rk#6], [id#2L ASC NULLS FIRST]"
    )
    assert count_global_windows(part) == 0
    assert count_global_windows(glob) == 1
    assert count_global_windows(part + "\n" + glob + "\n" + glob) == 2
