"""End-to-end census ETL plan: the reference's main() re-expressed as a
composable Spark pipeline (SURVEY.md §3.1 → §3.4).

    request_specs → fetch (mapInPandas, parallel) → dead-letter split
      → wire decode → normalize columns → mapping rename → align
      → union-by-name (implicit: decode emits one aligned frame)
      → cast_clean typed tier → layout write

vs the reference: zero driver-side pandas concat (the 85k-tract
national frame never materializes on the driver), fetch parallelism
instead of serial sleep, dead-letter table instead of fallback loops,
and the Redshift DISTSTYLE/SORTKEY layout becomes
repartition + sortWithinPartitions before a parquet/CSV write
(Test_census_tract.py:231-237 → free row-group skipping on read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from clean_census_acs_data_spark.sources import census as C
from clean_census_acs_data_spark.sources import rest as R
from clean_census_acs_data_spark.sources.audit import append_audit
from clean_census_acs_data_spark import transforms as T
from clean_census_acs_data_spark.session import _ab_nocache, tracked_cache

# Session-level memo of fetched RESPONSE frames, keyed on everything
# that shapes the wire bytes (r12, guide §1.2 step 1). Two registry
# entries run the IDENTICAL fetch (census_pipeline_e2e and
# census_write_readback: same table, year, chunking, fetcher), so the
# second used to pay the whole mapInPandas fetch leg again. The memo
# holds an eager localCheckpoint — the same session-shared-memo
# discipline as the knn/minhash stages, and exactly the materialized
# fetch output a production pipeline persists before decode anyway.
# Keyed on applicationId so a new session never sees a stale frame;
# disabled under the cold-A/B no-cache env (cache-vs-recompute
# comparisons must not be subsidized).
_RESPONSES_MEMO: dict = {}


def run_census_pipeline(
    spark: SparkSession,
    *,
    table_name: str = "dp02",
    year: int = 2023,
    fetcher: R.FetchFn | None = None,
    audit_path: str | None = None,
    cast_measures: bool = True,
    chunk_size: int = 3,
    preflight: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Returns (clean_df, dead_letter_df) for one logical table.

    ``fetcher`` injects the HTTP layer (tests use a deterministic
    fake; production uses the stdlib fetcher + api key).

    ``preflight=True`` runs the variables.json availability check
    (reference filter_available_variables, Test_census_tract.py:125-133)
    before building request specs: variables the vintage doesn't carry
    are dropped from the request (so they can't 400 every chunk into
    the dead-letter table) and surfaced as a diagnostic — logged, and
    recorded as `variable_unavailable` audit rows when ``audit_path``
    is set. Dropped variables still appear in the output schema as
    NULL columns (the reference's reindex semantics)."""
    cfg = C.DATASETS[table_name]
    request_cfg = cfg
    if preflight:
        if fetcher is None:
            fetcher = R.default_urllib_fetcher
        filtered, dropped = C.preflight_datasets(
            fetcher, year=year, datasets={table_name: cfg}
        )
        request_cfg = filtered[table_name]
        if dropped:
            import logging

            logging.getLogger(__name__).warning(
                "census preflight: %d unavailable variable(s) dropped for "
                "year=%s: %s", len(dropped), year, dropped,
            )
            if audit_path:
                diag = spark.createDataFrame(
                    [(t, v, year, "variable_unavailable") for t, v in dropped],
                    "table_name string, variable string, year int, reason string",
                )
                diag.write.mode("append").parquet(audit_path + "_preflight")
    specs = C.request_specs(
        spark, year=year, chunk_size=chunk_size,
        datasets={table_name: request_cfg},
    ).where(f"table_name = '{table_name}'")
    memo_key = (
        spark.sparkContext.applicationId,
        table_name,
        year,
        chunk_size,
        fetcher,
        tuple(request_cfg.get("variables", ())),
    )
    responses = None if _ab_nocache() else _RESPONSES_MEMO.get(memo_key)
    if responses is None:
        responses = R.fetch_responses(specs, fetcher=fetcher)
        if _ab_nocache():
            responses = responses.transform(tracked_cache)
        else:
            responses = responses.localCheckpoint(eager=True)
            _RESPONSES_MEMO[memo_key] = responses
    if audit_path:
        append_audit(responses, audit_path)
    ok, dead = R.split_dead_letters(responses)

    expected = ["NAME"] + list(dict.fromkeys(cfg["variables"]))
    decoded = R.decode_wire(ok, expected)

    mapping = C.load_mapping_dict(spark)
    out = T.normalize_columns(decoded)
    out = T.apply_mapping(out, mapping)
    labels = [mapping.get(v, v) for v in expected]
    out = T.align_schema(out, ["TABLE_NAME"] + labels)

    if cast_measures:
        # typed tier: measures → long, blanks + ACS sentinels → NULL
        measure_labels = [mapping[v] for v in cfg["variables"] if v in mapping]
        out = T.cast_clean(out, {c: "long" for c in measure_labels})
    return out, dead


def write_warehouse_layout(
    df: DataFrame,
    path: str,
    *,
    sort_cols: tuple[str, ...] = ("STATE_FIPS", "COUNTY", "TRACT"),
    num_files: int = 8,
    fmt: str = "parquet",
) -> None:
    """The DISTSTYLE EVEN + SORTKEY(state_fips, county, tract) analog
    (Test_census_tract.py:236-237): round-robin repartition for even
    file sizes, sortWithinPartitions so parquet row-group min/max stats
    give data skipping on the sort keys."""
    present = [c for c in sort_cols if c in df.columns]
    writer = df.repartition(num_files).sortWithinPartitions(*present).write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", True).csv(path)
    else:
        writer.parquet(path)


def write_keyed_layout(
    df: DataFrame,
    path: str,
    *,
    key: str = "STATE_FIPS",
    sort_cols: tuple[str, ...] = ("COUNTY", "TRACT"),
    target_rows_per_file: int | None = None,
) -> None:
    """The DISTKEY-analog writer, covering BOTH file-count regimes
    (VERDICT r11 ask #7).

    - ``target_rows_per_file=None`` (test scale): ``repartition(key)``
      before ``partitionBy(key)`` — one file per key, file count =
      distinct keys, not keys × tasks.
    - ``target_rows_per_file=t`` (the 100-TB regime): one-file-per-key
      INVERTS into the giant-file problem — a multi-TB key must split
      into target-sized files AND write in parallel. Policy (the
      ``compaction_bin_packing`` entry's, applied at write time): per
      key, bins = ceil(n_key / t) from a tiny count aggregate broadcast
      back; each row gets bin = pmod(hash(sort_cols), bins) and the
      shuffle keys on (key, bin), so a huge key's write is bins-wide
      parallel and every key's directory holds ~ceil(n/t) target-sized
      files. Hash-binning (not range) keeps the bin assignment
      narrow-dependency-cheap; rows stay sorted by ``sort_cols`` WITHIN
      each file via sortWithinPartitions, so sort-key page pruning
      still holds per file.
    """
    from pyspark.sql import functions as F

    present = [c for c in sort_cols if c in df.columns]
    if target_rows_per_file is None:
        out = df.repartition(key)
    else:
        if not present:
            # the bin hash needs within-key-varying inputs; silently
            # falling back would put a giant key in one bin (and
            # F.hash() with zero args is an AnalysisException anyway)
            raise ValueError(
                f"write_keyed_layout: none of sort_cols {sort_cols!r} "
                f"exist in the frame (columns: {df.columns}); the "
                "binned regime needs at least one present sort column "
                "to split a key's rows across files"
            )
        # One pass over the input for the per-key counts: collect the
        # manifest-grained rows (one per distinct key) and rebuild the
        # broadcast side from them, instead of re-running the full
        # upstream aggregate inside the join (r12 review finding — on
        # an expensive upstream frame the whole plan executed twice).
        key_rows = (
            df.groupBy(key)
            .agg(
                F.ceil(F.count(F.lit(1)) / target_rows_per_file)
                .cast("int")
                .alias("__bins")
            )
            .withColumnRenamed(key, "__key")
            .collect()
        )
        # Manifest-grained scalar (one row per distinct key, summed):
        # the explicit shuffle width keeps AQE from coalescing the
        # (key, bin) split back into few tasks — exactly the per-key
        # write parallelism the binning exists to buy.
        n_shuffle = max(sum(r["__bins"] or 0 for r in key_rows), 1)
        per_key = df.sparkSession.createDataFrame(
            key_rows, schema=f"__key {df.schema[key].dataType.simpleString()}, __bins int"
        )
        out = (
            # null-safe: a writer must not DROP null-keyed rows — plain
            # equality would lose every NULL key through the bin join
            df.join(
                F.broadcast(per_key), F.col(key).eqNullSafe(F.col("__key"))
            )
            .drop("__key")
            .withColumn(
                "__bin",
                F.pmod(
                    F.abs(F.hash(*[F.col(c) for c in present])),
                    F.greatest(F.col("__bins"), F.lit(1)),
                ),
            )
            .repartition(int(n_shuffle), key, "__bin")
            .drop("__bins", "__bin")
        )
    (
        out.sortWithinPartitions(key, *present)
        .write.mode("overwrite")
        .partitionBy(key)
        .parquet(path)
    )


def run_zcta_pipeline(
    spark: SparkSession,
    *,
    table_name: str = "dp02",
    year: int = 2017,
    fetcher: R.FetchFn | None = None,
    audit_path: str | None = None,
    cast_measures: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """The reference's second pipeline (test_final_zcta.py): 2017
    vintage, all ZCTAs in one request per dataset, geography column
    `zip code tabulation area` probed from the response (its header
    name contains spaces — kept verbatim through normalization)."""
    cfg = C.DATASETS[table_name]
    specs = C.zcta_request_specs(spark, year=year).where(f"table_name = '{table_name}'")
    responses = R.fetch_responses(
        specs,
        fetcher=fetcher,
        geo_for="zip code tabulation area:*",
        geo_in_states=False,
        num_partitions=4,
    ).transform(tracked_cache)
    if audit_path:
        append_audit(responses, audit_path)
    ok, dead = R.split_dead_letters(responses)

    expected = ["NAME"] + list(dict.fromkeys(cfg["variables"]))
    decoded = R.decode_wire(ok, expected).drop("state_fips")

    mapping = C.load_mapping_dict(spark)
    out = T.normalize_columns(decoded)
    out = T.apply_mapping(out, mapping)
    labels = [mapping.get(v, v) for v in expected]
    out = T.align_schema(out, ["TABLE_NAME"] + labels)
    if cast_measures:
        measure_labels = [mapping[v] for v in cfg["variables"] if v in mapping]
        out = T.cast_clean(out, {c: "long" for c in measure_labels})
    return out, dead
