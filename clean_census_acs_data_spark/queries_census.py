"""Reference-parity pipeline as a driver-contract entry (rows-only:
the input is the deterministic offline Census-API fake, not the sf
parquet tables, so no DuckDB oracle applies)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from clean_census_acs_data_spark.plans.census_pipeline import run_census_pipeline
from clean_census_acs_data_spark.queries import register
from clean_census_acs_data_spark.sources.fake_census import fake_census_fetcher


@register("census_pipeline_e2e")  # rows-only check
def census_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship ETL end-to-end on Spark: request-spec
    DataFrame → parallel mapInPandas fetch (deterministic offline fake,
    incl. retry/dead-letter/audit paths) → wire decode → normalize →
    mapping rename → align → typed cast tier. Deterministic output;
    sf_dir is unused (the census source is external, not a TPC-H
    table)."""
    clean, _dead = run_census_pipeline(
        spark, table_name="dp02", fetcher=fake_census_fetcher, cast_measures=True
    )
    return clean


@register("census_zcta_pipeline_e2e")  # rows-only check
def census_zcta_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's second pipeline (test_final_zcta.py): single-shot
    all-ZCTA fetch, geography column probed from the response. Offline
    fake; sf_dir unused."""
    from clean_census_acs_data_spark.plans.census_pipeline import run_zcta_pipeline
    from clean_census_acs_data_spark.sources.fake_census import fake_zcta_fetcher

    clean, _dead = run_zcta_pipeline(spark, table_name="dp02", fetcher=fake_zcta_fetcher)
    return clean


@register("census_preflight_pipeline")  # rows-only check
def census_preflight_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline with the variables.json availability pre-flight
    (reference filter_available_variables, Test_census_tract.py:
    125-133): a variable retired from the vintage is dropped from every
    request (never fetched, never dead-lettered) and its label comes
    back as a NULL column. Offline fake; sf_dir unused."""
    from clean_census_acs_data_spark.sources.fake_census import fake_metadata_fetcher

    clean, _dead = run_census_pipeline(
        spark,
        table_name="dp02",
        fetcher=fake_metadata_fetcher,
        cast_measures=True,
        preflight=True,
    )
    return clean


@register("census_rest_datasource_pushdown")  # rows-only check
def census_rest_datasource_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter pushdown through the Python Data Source: the
    state_fips IN (...) predicate prunes the request universe inside
    pushFilters(), so only the two wanted states are ever fetched (one
    partition instead of two). Offline fake; sf_dir unused."""
    from clean_census_acs_data_spark.sources.census_datasource import (
        register_census_datasource,
    )

    register_census_datasource(spark)
    df = (
        spark.read.format("census_rest")
        .option("year", 2023)
        .option("dataset", "acs/acs5/profile")
        .option("get_vars", "NAME,DP02_0060E,DP02_0061E,DP02_0062E")
        .option("states", "01,02,04,06,09,12")
        .option("chunk_size", 3)
        .option(
            "fetcher",
            "clean_census_acs_data_spark.sources.fake_census:fake_census_fetcher",
        )
        .option("max_attempts", 2)
        .load()
        .where("state_fips IN ('02', '12')")
    )
    return df


@register("census_rest_datasource")  # rows-only check
def census_rest_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The census REST source as a *registered Python Data Source*
    (Spark 4 DataSource API): partitions() = the reference's state
    chunks, executor-side fetch with retry, plan-time schema with
    NULL-fill alignment (sources/census_datasource.py). Offline fake;
    sf_dir unused."""
    from clean_census_acs_data_spark.sources.census_datasource import (
        register_census_datasource,
    )

    register_census_datasource(spark)
    df = (
        spark.read.format("census_rest")
        .option("year", 2023)
        .option("dataset", "acs/acs5/profile")
        .option("get_vars", "NAME,DP02_0060E,DP02_0061E,DP02_0062E")
        .option("states", "01,02,04,06,09,12")
        .option("chunk_size", 3)
        .option(
            "fetcher",
            "clean_census_acs_data_spark.sources.fake_census:fake_census_fetcher",
        )
        .option("max_attempts", 2)
        .load()
    )
    return df
