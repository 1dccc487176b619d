"""Table source adapter: parquet dirs now, Iceberg catalogs on a cluster."""

import pytest

from gpiv_spark.sources.tables import is_catalog_source, read_table

SF = "/root/testdata/sf0.01"


def test_path_sources_read_parquet(spark):
    df = read_table(spark, SF, "documents")
    assert df.count() == 500
    assert "doc_id" in df.columns


def test_catalog_identifiers_route_to_table_api(spark):
    assert is_catalog_source("lake.db")
    assert not is_catalog_source(SF)
    assert not is_catalog_source("relative/dir")
    # no Iceberg catalog in this sandbox: the table API raises cleanly
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        read_table(spark, "lake.db", "documents").count()
