"""Round-6 streaming twins (VERDICT r5 #6): the seasonal
decomposition and the correlogram — full-series statistics — run as
incremental daily rollups in a real watermarked stream, with the
exact batch pass re-evaluated over the drained aggregate per drain.
Each twin must be row-identical to its batch operator."""

from __future__ import annotations

import uuid


def _assert_twin(spark, streamed_name: str, batch_df) -> None:
    streamed = spark.sql(f"SELECT * FROM {streamed_name}")
    diff = (
        streamed.exceptAll(batch_df).count()
        + batch_df.exceptAll(streamed).count()
    )
    assert diff == 0 and batch_df.count() > 0


class TestRound6StreamingTwins:
    def test_seasonal_decompose_streaming_equals_batch(
        self, spark, sf_dir, tmp_path
    ):
        from dbt_eamples_spark.operators.behavior import (
            ts_seasonal_decompose,
        )
        from dbt_eamples_spark.streaming.streams import (
            ts_seasonal_decompose_streaming,
        )

        name = f"stl_{uuid.uuid4().hex[:8]}"
        ts_seasonal_decompose_streaming(
            spark, sf_dir, checkpoint=str(tmp_path / "ck_s"), out_table=name
        )
        _assert_twin(spark, name, ts_seasonal_decompose(spark, sf_dir))

    def test_autocorrelation_streaming_equals_batch(
        self, spark, sf_dir, tmp_path
    ):
        from dbt_eamples_spark.operators.behavior import (
            ts_autocorrelation,
        )
        from dbt_eamples_spark.streaming.streams import (
            ts_autocorrelation_streaming,
        )

        name = f"acf_{uuid.uuid4().hex[:8]}"
        ts_autocorrelation_streaming(
            spark, sf_dir, checkpoint=str(tmp_path / "ck_a"), out_table=name
        )
        _assert_twin(spark, name, ts_autocorrelation(spark, sf_dir))

    def test_cross_correlation_streaming_equals_batch(
        self, spark, sf_dir, tmp_path
    ):
        from dbt_eamples_spark.operators.behavior import (
            ts_cross_correlation,
        )
        from dbt_eamples_spark.streaming.streams import (
            ts_cross_correlation_streaming,
        )

        name = f"xcorr_{uuid.uuid4().hex[:8]}"
        ts_cross_correlation_streaming(
            spark, sf_dir, checkpoint=str(tmp_path / "ck_x"), out_table=name
        )
        _assert_twin(spark, name, ts_cross_correlation(spark, sf_dir))

    def test_rolling_median_streaming_equals_batch(
        self, spark, sf_dir, tmp_path
    ):
        from dbt_eamples_spark.operators.behavior import (
            ts_rolling_median,
        )
        from dbt_eamples_spark.streaming.streams import (
            ts_rolling_median_streaming,
        )

        name = f"rollmed_{uuid.uuid4().hex[:8]}"
        ts_rolling_median_streaming(
            spark, sf_dir, checkpoint=str(tmp_path / "ck_rm"), out_table=name
        )
        _assert_twin(spark, name, ts_rolling_median(spark, sf_dir))

    def test_hampel_streaming_equals_batch(self, spark, sf_dir, tmp_path):
        from dbt_eamples_spark.operators.behavior import (
            ts_hampel_outliers,
        )
        from dbt_eamples_spark.streaming.streams import (
            ts_hampel_outliers_streaming,
        )

        name = f"hampel_{uuid.uuid4().hex[:8]}"
        ts_hampel_outliers_streaming(
            spark, sf_dir, checkpoint=str(tmp_path / "ck_h"), out_table=name
        )
        _assert_twin(spark, name, ts_hampel_outliers(spark, sf_dir))
