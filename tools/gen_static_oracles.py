"""Generate static-expected DuckDB oracles for the xxhash64-based dedup
gates (t8 minhash-LSH, t9 simhash, t15 winnowing).

These three operators hash with Spark's xxhash64, which DuckDB cannot
reproduce, so no *computed* cross-engine oracle exists.  The VALUES this
script emits are REGRESSION PINS of the implementation's own output —
they stop silent drift but cannot by themselves prove the output right.
Independence is supplied elsewhere: the portable md5 twins (t17/t18/t19)
prove the algorithms end-to-end with full computed oracles, and
tests/test_static_oracle_independence.py recomputes each pinned row set
from scratch (pure-Python XXH64 + Python pipeline twins), so a wrong
hash or pairing cannot be baked into its own expectation unnoticed.
Mechanics of the pins:

- runs each query through ``__spark_entry__.queries()`` at every
  ``/root/testdata/sf*`` scale factor,
- computes a corpus checksum (SUM((doc_id+1) * n_chars)) per SF with
  DuckDB — the discriminator, since all SFs hold 500 documents,
- emits ``plans/static_oracles.py`` containing one UNION-of-guarded-
  branches SQL per query: each branch's VALUES are returned only when
  the live corpus checksum matches the one recorded at generation time,
  so a regenerated testdata set yields 0 rows (a loud gate failure)
  rather than silently passing stale expectations.

Rerun after any change to the dedup operators or testdata:

    python tools/gen_static_oracles.py
"""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from ecommerce_data_pipeline_23a91a05i4_spark.session import get_spark  # noqa: E402

TARGETS: dict[str, list[tuple[str, str]]] = {
    # query -> [(column, duckdb cast type)] in output order
    "t8_minhash_lsh": [("id_a", "BIGINT"), ("id_b", "BIGINT"), ("jaccard", "DOUBLE")],
    "t9_simhash": [("id_a", "BIGINT"), ("id_b", "BIGINT"), ("hamming", "BIGINT")],
    "t15_winnow_dedup": [
        ("id_a", "BIGINT"),
        ("id_b", "BIGINT"),
        ("shared_fingerprints", "BIGINT"),
    ],
    # Deterministic by construction: Python stub encoder is seeded by
    # content sha and avg_f0 is an exact decimal-sum mean (corpus.py).
    "t24_multimodal_features": [
        ("source", "VARCHAR"),
        ("n_assets", "BIGINT"),
        ("total_bytes", "BIGINT"),
        ("avg_f0", "DOUBLE"),
        ("min_width", "INTEGER"),
        ("max_height", "INTEGER"),
    ],
    # Deterministic by construction: synthetic MJPEG/AVI assets are a
    # pure function of (doc_id, frame index), and the decode path is
    # the VENDORED T.81 decoder on purpose (tier-independent pixel
    # bytes) — see plans/corpus.t102_mjpeg_frame_decode.
    "t102_mjpeg_frame_decode": [
        ("source", "VARCHAR"),
        ("n_assets", "BIGINT"),
        ("total_frames", "BIGINT"),
        ("max_last_offset_ms", "BIGINT"),
        ("total_frame_bytes", "BIGINT"),
        ("frame_hash_sum", "BIGINT"),
    ],
}

CHECKSUM_SQL = "SELECT SUM((doc_id + 1) * n_chars) FROM documents"


def corpus_checksum(sf_dir: str) -> int:
    con = duckdb.connect()
    val = con.execute(
        CHECKSUM_SQL.replace(
            "documents", f"read_parquet('{sf_dir}/documents.parquet')"
        )
    ).fetchone()[0]
    con.close()
    return int(val)


def lit(v) -> str:
    # repr() of a float is the shortest round-trip form; DuckDB parses it
    # back to the identical IEEE-754 double, so value-hash checks match.
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(int(v))


def branch_sql(cols: list[tuple[str, str]], rows: list, checksum: int) -> str:
    values = ",\n            ".join(
        "(" + ", ".join(lit(v) for v in row) + ")" for row in rows
    )
    select = ", ".join(f"CAST({c} AS {t}) AS {c}" for c, t in cols)
    names = ", ".join(c for c, _ in cols)
    return (
        f"        SELECT {select}\n"
        f"        FROM (VALUES\n            {values}\n        ) v({names})\n"
        f"        WHERE ({CHECKSUM_SQL}) = {checksum}"
    )


def main() -> None:
    # Only the SFs the correctness gates actually run at: sf0.01 is the
    # driver's gate, sf0.001 the local cross-SF probe.  sf0.1 is bench-only
    # and would add thousands of literal rows for no checked path.
    sf_dirs = [d for d in sorted(glob.glob("/root/testdata/sf*"))
               if d.endswith(("sf0.001", "sf0.01"))]
    spark = get_spark("gen-static-oracles")
    queries = entry_mod.queries()

    per_query: dict[str, list[str]] = {name: [] for name in TARGETS}
    for sf_dir in sf_dirs:
        checksum = corpus_checksum(sf_dir)
        for name, cols in TARGETS.items():
            rows = queries[name](spark, sf_dir).collect()
            per_query[name].append(branch_sql(cols, rows, checksum))
            print(f"{sf_dir} {name}: {len(rows)} rows, checksum={checksum}")

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ecommerce_data_pipeline_23a91a05i4_spark",
        "plans",
        "static_oracles.py",
    )
    with open(out_path, "w") as f:
        f.write(
            '"""Static-expected oracles for the xxhash64 dedup gates.\n'
            "\n"
            "GENERATED by tools/gen_static_oracles.py — do not hand-edit.\n"
            "Each SQL returns the recorded expected rows only when the live\n"
            "corpus checksum matches generation time, so stale expectations\n"
            'fail loudly instead of passing silently.\n"""\n\n'
            "STATIC_ORACLES: dict[str, str] = {\n"
        )
        for name, branches in per_query.items():
            order_cols = ", ".join(c for c, _ in TARGETS[name][:2])
            body = "\n        UNION ALL\n".join(branches)
            f.write(
                f'    "{name}": """\n{body}\n'
                f"        ORDER BY {order_cols}\n"
                f'    """,\n'
            )
        f.write("}\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
