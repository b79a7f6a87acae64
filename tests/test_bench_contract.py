"""Bench contract guards (no Spark required): the driver parses ONE JSON
line from bench.py, so pure-Python failures in its bookkeeping must be
caught by pytest, not by the driver's BENCH_r{N}.json."""

from __future__ import annotations

import bench


def test_headline_selector_handles_every_registered_query_name():
    """The q1-q10 headline filter must accept every current (and
    plausible future) queries() key without raising — q22b's suffix
    crashed an earlier int() parse."""
    import __spark_entry__ as entry_mod

    names = list(entry_mod._QUERIES)
    picked = bench.headline_names(names)
    # Registry order no longer starts at q1 (rotation schedule), so the
    # headline must be exactly q1..q10 as a SET, registry-order preserved.
    assert sorted(int(n.split("_")[0][1:]) for n in picked) == list(range(1, 11))
    assert [n for n in names if n in picked] == picked
    assert len(picked) == 10
    assert all(n.startswith("q") for n in picked)
    assert "q22b_price_percentiles_windowed" not in picked
    assert "q10_discount_impact" in picked and "q1_top_products" in picked


def test_headline_selector_tolerates_arbitrary_names():
    weird = ["q1_a", "q10_b", "q11_c", "qxx_d", "t5_e", "s1_f", "q22b_g", "zz"]
    assert bench.headline_names(weird) == ["q1_a", "q10_b"]


def test_headline_total_nulls_out_on_any_headline_failure():
    names = ["q1_a", "q2_b", "q11_c"]
    total, failed = bench.headline_total(
        names, {"q1_a": 1.0, "q11_c": 9.0}, {"q2_b": "Boom: x"}
    )
    assert total is None and failed == ["q2_b"]
    # Non-headline failures must NOT null the headline.
    total, failed = bench.headline_total(
        names, {"q1_a": 1.0, "q2_b": 2.0}, {"q11_c": "Boom: y"}
    )
    assert total == 3.0 and failed == []
