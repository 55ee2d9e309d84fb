"""LSH banding operating-point curve (dedup.lsh_recall_curve).

The four configs are nested by refinement — a pair colliding under
(b, r) banding agrees on r consecutive hashes, hence on every
sub-block of a finer split — so (1,8) ⊆ (2,4) ⊆ (4,2) ⊆ (8,1) as
candidate sets, and recall must be monotone in the same order with
recall(8,1) ≡ 1.0 (the truth set is defined within its candidates).
"""

from __future__ import annotations

from cloud_native_reddit_data_pipeline_spark.operators import dedup
from cloud_native_reddit_data_pipeline_spark.sources.tables import load

SF = "/root/testdata/sf0.001"


def test_curve_shape_and_monotonicity(spark):
    out = dedup.lsh_recall_curve(
        load(spark, SF, "documents"), "doc_id", "text"
    ).collect()
    by_bands = {r["bands"]: r for r in out}
    assert set(by_bands) == {8, 4, 2, 1}
    assert all(r["bands"] * r["rows_per_band"] == 8 for r in out)
    # the synthetic corpus has injected near-dups: non-degenerate curve
    assert by_bands[8]["n_truth"] > 0
    # same truth denominator on every row
    assert len({r["n_truth"] for r in out}) == 1
    # refinement nesting: candidate volume and capture both monotone
    for a, b in ((1, 2), (2, 4), (4, 8)):
        assert by_bands[a]["n_candidates"] <= by_bands[b]["n_candidates"]
        assert by_bands[a]["n_captured"] <= by_bands[b]["n_captured"]
    # truth lives inside the loosest config's candidates by construction
    assert by_bands[8]["recall"] == 1.0
    assert by_bands[8]["n_captured"] == by_bands[8]["n_truth"]
