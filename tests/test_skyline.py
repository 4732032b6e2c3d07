"""Skyline query semantics: the window formulation must equal the
dominance definition on the real table."""

from __future__ import annotations

from sparkstreamingproject_spark.queries import REGISTRY


def test_skyline_equals_dominance_definition(spark, sf_dir):
    rows = REGISTRY["skyline_price_size"].fn(spark, sf_dir).collect()
    pts = {(r["cents"], r["size"]) for r in rows}
    assert pts, "skyline cannot be empty (global min price survives)"
    # no kept point dominated by another kept point
    for a in pts:
        for b in pts:
            if a != b:
                assert not (b[0] <= a[0] and b[1] <= a[1]
                            and (b[0] < a[0] or b[1] < a[1])), (a, b)
    # every dropped point is dominated by some kept point
    part = (spark.read.parquet(f"{sf_dir}/part.parquet")
            .selectExpr("CAST(round(p_retailprice * 100) AS BIGINT) c",
                        "CAST(p_size AS BIGINT) s").collect())
    for r in part:
        p = (r["c"], r["s"])
        if p in pts:
            continue
        assert any(k[0] <= p[0] and k[1] <= p[1]
                   and (k[0] < p[0] or k[1] < p[1]) for k in pts), p
