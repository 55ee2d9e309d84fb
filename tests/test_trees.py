"""operators/trees.py — bounded-depth tree flattening.

Hand-built forests with known paths, leaves, and subtree sums; the
depth bound and cycle behavior are pinned explicitly (a parent cycle
must be DROPPED by the bound, not loop forever)."""

from __future__ import annotations

from cloud_native_reddit_data_pipeline_spark.operators import trees


def _forest(spark):
    #        1              2
    #       / \              \
    #      3   4              5
    #     /                    \
    #    6                      7
    rows = [
        (1, None),
        (2, None),
        (3, 1),
        (4, 1),
        (5, 2),
        (6, 3),
        (7, 5),
    ]
    return spark.createDataFrame(rows, "id long, parent_id long")


def test_tree_paths_exact(spark):
    got = {
        r["node_id"]: (r["root_id"], r["depth"], r["path"])
        for r in trees.tree_paths(_forest(spark)).collect()
    }
    assert got == {
        1: (1, 0, "1"),
        2: (2, 0, "2"),
        3: (1, 1, "1/3"),
        4: (1, 1, "1/4"),
        5: (2, 1, "2/5"),
        6: (1, 2, "1/3/6"),
        7: (2, 2, "2/5/7"),
    }


def test_depth_bound_drops_deeper_nodes(spark):
    paths = trees.tree_paths(_forest(spark), max_depth=1)
    got = sorted(r["node_id"] for r in paths.collect())
    assert got == [1, 2, 3, 4, 5]  # depth-2 nodes 6, 7 dropped


def test_cycle_terminates_under_bound(spark):
    # 10 <-> 11 cycle with no root ancestor: unreachable from any
    # root, so it must simply never appear — and the fixed-round
    # descent must terminate.
    rows = [(1, None), (10, 11), (11, 10)]
    nodes = spark.createDataFrame(rows, "id long, parent_id long")
    got = sorted(r["node_id"] for r in trees.tree_paths(nodes, max_depth=8).collect())
    assert got == [1]


def test_mark_leaves(spark):
    nodes = _forest(spark)
    paths = trees.mark_leaves(trees.tree_paths(nodes), nodes)
    leaves = sorted(r["node_id"] for r in paths.collect() if r["is_leaf"])
    assert leaves == [4, 6, 7]


def test_subtree_rollup_exact(spark):
    nodes = _forest(spark)
    paths = trees.tree_paths(nodes)
    metrics = spark.createDataFrame(
        [(i, 10 * i) for i in range(1, 8)], "id long, m long"
    )
    got = {
        r["node_id"]: (r["subtree_nodes"], r["subtree_m"])
        for r in trees.subtree_rollup(paths, metrics, "m", id_col="id").collect()
    }
    # node 1 covers {1,3,4,6}: 4 nodes, m = 10+30+40+60
    assert got[1] == (4, 140)
    assert got[3] == (2, 90)  # {3,6}
    assert got[2] == (3, 140)  # {2,5,7}
    assert got[6] == (1, 60)
    assert len(got) == 7
