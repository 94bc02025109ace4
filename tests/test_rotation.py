"""Oracle checks for queries outside the 50-entry driver registry.

The driver gate only sees the first 50 registered queries.  Every
multiply-proven variant rotated out across rounds 3-7 (making room
for the corpus ops, the compositions, the iterative-op kernels, and
each round's new surfaces — see the ``__spark_entry__.queries``
docstring for the per-round ledger) lands here, and ops occasionally
are born here when the registry is full before being promoted (the
late-r6 graph/rollup/color-JPEG six moved to the driver gate in r7).
All get the same Spark-vs-DuckDB hash comparison the driver runs,
executed in pytest so the hard signal never lapses.
"""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
import pytest

from tests.conftest import SF_SMOKE

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(v):
    # mirrors tools/driver_check.norm_cell
    if isinstance(v, float):
        if v == 0.0:
            v = 0.0
        return repr(round(v, 6))
    return repr(v)


def _hash(pdf: pd.DataFrame) -> str:
    cols = sorted(pdf.columns)
    rows = sorted(
        "|".join(_norm(v) for v in row)
        for row in pdf[cols].itertuples(index=False)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode() + b"\n")
    return h.hexdigest()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    yield con
    con.close()


def _sketch_rotated(spark, sf_dir):
    from gemmsql.sketches import user_reach_sketch

    return user_reach_sketch(spark, sf_dir)


def _sketch_rotated_sql():
    from gemmsql.sketches import USER_REACH_SKETCH_SQL

    return USER_REACH_SKETCH_SQL


def _entry(name):
    import __spark_entry__ as entrymod

    return getattr(entrymod, name)


def _payload_meta(spark, sf_dir):
    from gemmsql.pipeline.multimodal import payload_meta

    return payload_meta(spark, sf_dir)


def _payload_meta_sql():
    from gemmsql.pipeline.multimodal import PAYLOAD_META_SQL

    return PAYLOAD_META_SQL


def _bpe_pair_counts(spark, sf_dir):
    from gemmsql.pipeline.bpe import bpe_pair_counts

    return bpe_pair_counts(spark, sf_dir)


def _bpe_pair_counts_sql():
    from gemmsql.pipeline.bpe import BPE_PAIR_COUNTS_SQL

    return BPE_PAIR_COUNTS_SQL


def _streaming_enrich(spark, sf_dir):
    from gemmsql.streaming.windows import streaming_enrich_gate

    return streaming_enrich_gate(spark, sf_dir)


def _streaming_enrich_sql():
    from gemmsql.streaming.windows import STREAMING_ENRICH_GATE_SQL

    return STREAMING_ENRICH_GATE_SQL


def _frame_stats(spark, sf_dir):
    from gemmsql.pipeline.multimodal import frame_stats

    return frame_stats(spark, sf_dir)


def _frame_stats_sql():
    from gemmsql.pipeline.multimodal import FRAME_STATS_SQL

    return FRAME_STATS_SQL


def _resize_stats(spark, sf_dir):
    from gemmsql.pipeline.multimodal import resize_stats

    return resize_stats(spark, sf_dir)


def _resize_stats_sql():
    from gemmsql.pipeline.multimodal import RESIZE_STATS_SQL

    return RESIZE_STATS_SQL


def _payload_features(spark, sf_dir):
    from gemmsql.pipeline.multimodal import payload_features

    return payload_features(spark, sf_dir)


def _payload_features_sql():
    from gemmsql.pipeline.multimodal import PAYLOAD_FEATURES_SQL

    return PAYLOAD_FEATURES_SQL


def _audio_features(spark, sf_dir):
    from gemmsql.pipeline.multimodal import audio_features

    return audio_features(spark, sf_dir)


def _audio_features_sql():
    from gemmsql.pipeline.multimodal import AUDIO_FEATURES_SQL

    return AUDIO_FEATURES_SQL


def _doc_chunks(spark, sf_dir):
    from gemmsql.pipeline.text import doc_chunks

    return doc_chunks(spark, sf_dir)


def _doc_chunks_sql():
    from gemmsql.pipeline.text import DOC_CHUNKS_SQL

    return DOC_CHUNKS_SQL


def _pii_scrub_corpus(spark, sf_dir):
    from gemmsql.pipeline.text import pii_scrub_corpus

    return pii_scrub_corpus(spark, sf_dir)


def _pii_scrub_corpus_sql():
    from gemmsql.pipeline.text import PII_SCRUB_CORPUS_SQL

    return PII_SCRUB_CORPUS_SQL


def _mixture_balance(spark, sf_dir):
    from gemmsql.pipeline.text import mixture_balance

    return mixture_balance(spark, sf_dir)


def _mixture_balance_sql():
    from gemmsql.pipeline.text import MIXTURE_BALANCE_SQL

    return MIXTURE_BALANCE_SQL


def _bloom_decontaminate_sql():
    from gemmsql.sketches import bloom_decontaminate_sql

    return bloom_decontaminate_sql()


def _sampling_filtered_sql():
    from gemmsql.ops.sampling import sampling_filtered_sql

    return sampling_filtered_sql()


def _layout_audit(spark, sf_dir):
    from gemmsql.pipeline.parquet_meta import layout_audit

    return layout_audit(spark, sf_dir)


def _layout_audit_sql():
    # same staged-path discipline as the promoted parquet_footer_stats:
    # the Spark side (run first) stages both layouts; the oracle reads
    # the SAME files with DuckDB's native parquet_metadata()
    from gemmsql.pipeline.parquet_meta import layout_audit_sql

    return layout_audit_sql(SF_SMOKE)


def _warc_ingest(spark, sf_dir):
    from gemmsql.pipeline.warc import warc_ingest

    return warc_ingest(spark, sf_dir)


def _warc_ingest_sql():
    from gemmsql.pipeline.warc import WARC_INGEST_SQL

    return WARC_INGEST_SQL


def _tar_shard_ingest(spark, sf_dir):
    from gemmsql.pipeline.tarshard import tar_shard_ingest

    return tar_shard_ingest(spark, sf_dir)


def _tar_shard_ingest_sql():
    from gemmsql.pipeline.tarshard import TAR_SHARD_INGEST_SQL

    return TAR_SHARD_INGEST_SQL


def _gif_anim_features(spark, sf_dir):
    from gemmsql.pipeline.gif import gif_anim_features

    return gif_anim_features(spark, sf_dir)


def _gif_anim_features_sql():
    from gemmsql.pipeline.gif import GIF_ANIM_FEATURES_SQL

    return GIF_ANIM_FEATURES_SQL


def _mp3_stream_stats(spark, sf_dir):
    from gemmsql.pipeline.mp3 import mp3_stream_stats

    return mp3_stream_stats(spark, sf_dir)


def _mp3_stream_stats_sql():
    from gemmsql.pipeline.mp3 import MP3_STREAM_STATS_SQL

    return MP3_STREAM_STATS_SQL


def _dq_orders_report(spark, sf_dir):
    from gemmsql.pipeline.dq import dq_orders_report

    return dq_orders_report(spark, sf_dir)


def _dq_orders_report_sql():
    from gemmsql.pipeline.dq import DQ_ORDERS_REPORT_SQL

    return DQ_ORDERS_REPORT_SQL


def _dq_orders_quarantine(spark, sf_dir):
    from gemmsql.pipeline.dq import dq_orders_quarantine

    return dq_orders_quarantine(spark, sf_dir)


def _dq_orders_quarantine_sql():
    from gemmsql.pipeline.dq import DQ_ORDERS_QUARANTINE_SQL

    return DQ_ORDERS_QUARANTINE_SQL


def _pagerank_step(spark, sf_dir):
    from gemmsql.pipeline.graph import pagerank_step

    return pagerank_step(spark, sf_dir)


def _pagerank_step_sql():
    from gemmsql.pipeline.graph import PAGERANK_STEP_SQL

    return PAGERANK_STEP_SQL


def _basket_rules(spark, sf_dir):
    from gemmsql.pipeline.graph import basket_rules

    return basket_rules(spark, sf_dir)


def _basket_rules_sql():
    from gemmsql.pipeline.graph import BASKET_RULES_SQL

    return BASKET_RULES_SQL


def _concurrent_events(spark, sf_dir):
    from gemmsql.pipeline.joins import concurrent_events

    return concurrent_events(spark, sf_dir)


def _concurrent_events_sql():
    from gemmsql.pipeline.joins import CONCURRENT_EVENTS_SQL

    return CONCURRENT_EVENTS_SQL


def _zip_split_ingest(spark, sf_dir):
    from gemmsql.pipeline.zipshard import zip_shard_ingest_split

    # 4 KiB target so the smoke corpus genuinely fans out per shard
    return zip_shard_ingest_split(spark, sf_dir, target_split_bytes=4096)


def _zip_split_ingest_sql():
    from gemmsql.pipeline.zipshard import ZIP_SHARD_INGEST_SQL

    return ZIP_SHARD_INGEST_SQL


def _url_canonical_rot(spark, sf_dir):
    from gemmsql.pipeline.urls import url_canonical

    return url_canonical(spark, sf_dir)


def _url_canonical_rot_sql():
    from gemmsql.pipeline.urls import URL_CANONICAL_SQL

    return URL_CANONICAL_SQL


def _bpe_tokenize_rot(spark, sf_dir):
    from gemmsql.pipeline.bpe import bpe_tokenize

    return bpe_tokenize(spark, sf_dir)


def _bpe_tokenize_rot_sql():
    from gemmsql.pipeline.bpe import bpe_tokenize_sql

    return bpe_tokenize_sql()


def _dq_quarantine_full_rot(spark, sf_dir):
    from gemmsql.pipeline.dq import dq_orders_quarantine_full

    return dq_orders_quarantine_full(spark, sf_dir)


def _dq_quarantine_full_rot_sql():
    from gemmsql.pipeline.dq import DQ_ORDERS_QUARANTINE_FULL_SQL

    return DQ_ORDERS_QUARANTINE_FULL_SQL


def _zorder_audit_rot(spark, sf_dir):
    from gemmsql.pipeline.parquet_meta import zorder_audit

    return zorder_audit(spark, sf_dir)


def _zorder_audit_rot_sql():
    from gemmsql.pipeline.parquet_meta import zorder_audit_sql

    return zorder_audit_sql(SF_SMOKE)


def _compaction_audit_rot(spark, sf_dir):
    from gemmsql.pipeline.parquet_meta import compaction_audit

    return compaction_audit(spark, sf_dir)


def _compaction_audit_rot_sql():
    from gemmsql.pipeline.parquet_meta import compaction_audit_sql

    return compaction_audit_sql(SF_SMOKE)


def _dedup_keep_best_rot(spark, sf_dir):
    from gemmsql.pipeline.dedup import dedup_keep_best

    return dedup_keep_best(spark, sf_dir)


def _dedup_keep_best_rot_sql():
    from gemmsql.pipeline.dedup import dedup_keep_best_sql

    return dedup_keep_best_sql()


def _png_features_rot(spark, sf_dir):
    from gemmsql.pipeline.multimodal import png_features

    return png_features(spark, sf_dir)


def _png_features_rot_sql():
    from gemmsql.pipeline.multimodal import PNG_FEATURES_SQL

    return PNG_FEATURES_SQL


def _adpcm_features_rot(spark, sf_dir):
    from gemmsql.pipeline.adpcm import adpcm_features

    return adpcm_features(spark, sf_dir)


def _adpcm_features_rot_sql():
    from gemmsql.pipeline.adpcm import ADPCM_FEATURES_SQL

    return ADPCM_FEATURES_SQL


def _streaming_hist_rot(spark, sf_dir):
    from gemmsql.streaming.windows import streaming_hist_gate

    return streaming_hist_gate(spark, sf_dir)


def _streaming_hist_rot_sql():
    from gemmsql.streaming.windows import STREAMING_HIST_GATE_SQL

    return STREAMING_HIST_GATE_SQL


def _image_near_dups(spark, sf_dir):
    from gemmsql.pipeline.phash import image_near_dups

    return image_near_dups(spark, sf_dir)


def _image_near_dups_sql():
    from gemmsql.pipeline.phash import IMAGE_NEAR_DUPS_SQL

    return IMAGE_NEAR_DUPS_SQL


def _seqfile_shard_ingest(spark, sf_dir):
    from gemmsql.pipeline.seqfile import seqfile_shard_ingest

    return seqfile_shard_ingest(spark, sf_dir)


def _seqfile_split_ingest(spark, sf_dir):
    from gemmsql.pipeline.seqfile import seqfile_split_ingest

    return seqfile_split_ingest(spark, sf_dir, target_split_bytes=4096)


def _seqfile_ingest_sql():
    from gemmsql.pipeline.seqfile import SEQFILE_SHARD_INGEST_SQL

    return SEQFILE_SHARD_INGEST_SQL


def _segment_value_quantiles(spark, sf_dir):
    from gemmsql.sketches import segment_value_quantiles

    return segment_value_quantiles(spark, sf_dir)


def _segment_value_quantiles_sql():
    from gemmsql.sketches import segment_value_quantiles_sql

    return segment_value_quantiles_sql()


def _avro_shard_ingest(spark, sf_dir):
    from gemmsql.pipeline.avro import avro_shard_ingest

    return avro_shard_ingest(spark, sf_dir)


def _avro_shard_ingest_sql():
    from gemmsql.pipeline.avro import AVRO_SHARD_INGEST_SQL

    return AVRO_SHARD_INGEST_SQL


def _ogg_split_ingest(spark, sf_dir):
    from gemmsql.pipeline.ogg import ogg_split_ingest

    return ogg_split_ingest(spark, sf_dir, target_split_bytes=4096)


def _ogg_shard_ingest(spark, sf_dir):
    from gemmsql.pipeline.ogg import ogg_shard_ingest

    return ogg_shard_ingest(spark, sf_dir)


def _ogg_shard_ingest_sql():
    from gemmsql.pipeline.ogg import OGG_SHARD_INGEST_SQL

    return OGG_SHARD_INGEST_SQL


def _streaming_mor_ivm(spark, sf_dir):
    from gemmsql.pipeline.tablelog import streaming_mor_ivm_gate

    return streaming_mor_ivm_gate(spark, sf_dir)


def _streaming_mor_ivm_sql():
    from gemmsql.pipeline.tablelog import MOR_DELETE_READ_SQL

    return MOR_DELETE_READ_SQL


def _column_mapping_read(spark, sf_dir):
    from gemmsql.pipeline.tablelog import column_mapping_read

    return column_mapping_read(spark, sf_dir)


def _column_mapping_read_sql():
    from gemmsql.pipeline.tablelog import COLUMN_MAPPING_READ_SQL

    return COLUMN_MAPPING_READ_SQL


def _qoi_features(spark, sf_dir):
    from gemmsql.pipeline.qoi import qoi_features

    return qoi_features(spark, sf_dir)


def _qoi_features_sql():
    from gemmsql.pipeline.qoi import QOI_FEATURES_SQL

    return QOI_FEATURES_SQL


def _sample_quantiles(spark, sf_dir):
    from gemmsql.sketches import sample_quantiles

    return sample_quantiles(spark, sf_dir)


def _sample_quantiles_sql():
    from gemmsql.sketches import sample_quantiles_sql

    return sample_quantiles_sql()


def _hist_quantiles(spark, sf_dir):
    from gemmsql.sketches import hist_quantiles

    return hist_quantiles(spark, sf_dir)


def _hist_quantiles_sql():
    from gemmsql.sketches import HIST_QUANTILES_SQL

    return HIST_QUANTILES_SQL


def _cm_heavy_hitters(spark, sf_dir):
    from gemmsql.sketches import cm_heavy_hitters

    return cm_heavy_hitters(spark, sf_dir)


def _cm_heavy_hitters_sql():
    from gemmsql.sketches import cm_heavy_hitters_sql

    return cm_heavy_hitters_sql()


def _kmv_reach(spark, sf_dir):
    from gemmsql.sketches import kmv_reach

    return kmv_reach(spark, sf_dir)


def _kmv_reach_sql():
    from gemmsql.sketches import KMV_REACH_SQL

    return KMV_REACH_SQL


def _parquet_footer_stats(spark, sf_dir):
    from gemmsql.pipeline.parquet_meta import parquet_footer_stats

    return parquet_footer_stats(spark, sf_dir)


def _parquet_footer_stats_sql():
    from gemmsql.pipeline.parquet_meta import parquet_footer_stats_sql

    return parquet_footer_stats_sql(SF_SMOKE)


def _mp3_frame_stats_rot(spark, sf_dir):
    from gemmsql.pipeline.media_split import mp3_frame_stats

    return mp3_frame_stats(spark, sf_dir)


def _mp3_frame_stats_rot_sql():
    from gemmsql.pipeline.media_split import mp3_frame_stats_sql

    return mp3_frame_stats_sql()


def _jpeg_features_rot(spark, sf_dir):
    from gemmsql.pipeline.jpeg import jpeg_features

    return jpeg_features(spark, sf_dir)


def _jpeg_features_rot_sql():
    from gemmsql.pipeline.jpeg import JPEG_FEATURES_SQL

    return JPEG_FEATURES_SQL


def _semantic_dups_rot(spark, sf_dir):
    from gemmsql.pipeline.similarity import semantic_dups

    return semantic_dups(spark, sf_dir)


def _semantic_dups_rot_sql():
    from gemmsql.pipeline.similarity import SEMANTIC_DUPS_SQL

    return SEMANTIC_DUPS_SQL


def _quality_classifier_rot(spark, sf_dir):
    from gemmsql.pipeline.text import quality_classifier

    return quality_classifier(spark, sf_dir)


def _quality_classifier_rot_sql():
    from gemmsql.pipeline.text import QUALITY_CLASSIFIER_SQL

    return QUALITY_CLASSIFIER_SQL


def _dsir_weights_rot(spark, sf_dir):
    from gemmsql.pipeline.dsir import dsir_weights

    return dsir_weights(spark, sf_dir)


def _dsir_weights_rot_sql():
    from gemmsql.pipeline.dsir import DSIR_WEIGHTS_SQL

    return DSIR_WEIGHTS_SQL


def _jpeg_color_features_rot(spark, sf_dir):
    from gemmsql.pipeline.jpeg import jpeg_color_features

    return jpeg_color_features(spark, sf_dir)


def _jpeg_color_features_rot_sql():
    from gemmsql.pipeline.jpeg import JPEG_COLOR_FEATURES_SQL

    return JPEG_COLOR_FEATURES_SQL


def _flac_frame_stats_rot(spark, sf_dir):
    from gemmsql.pipeline.media_split import flac_frame_stats

    return flac_frame_stats(spark, sf_dir)


def _flac_frame_stats_rot_sql():
    from gemmsql.pipeline.media_split import flac_frame_stats_sql

    return flac_frame_stats_sql()


def _zip_shard_ingest_rot(spark, sf_dir):
    from gemmsql.pipeline.zipshard import zip_shard_ingest

    return zip_shard_ingest(spark, sf_dir)


def _avro_split_ingest_rot(spark, sf_dir):
    from gemmsql.pipeline.avro import avro_split_ingest

    return avro_split_ingest(spark, sf_dir, target_split_bytes=4096)


def _time_travel_read_rot(spark, sf_dir):
    from gemmsql.pipeline.tablelog import time_travel_read

    return time_travel_read(spark, sf_dir)


def _time_travel_read_rot_sql():
    from gemmsql.pipeline.tablelog import time_travel_read_sql

    return time_travel_read_sql(SF_SMOKE)


def _sketch_store_rollup_rot(spark, sf_dir):
    from gemmsql.sketches import sketch_store_rollup

    return sketch_store_rollup(spark, sf_dir)


def _sketch_store_rollup_rot_sql():
    from gemmsql.sketches import SKETCH_STORE_ROLLUP_SQL

    return SKETCH_STORE_ROLLUP_SQL


def _streaming_join_rot(spark, sf_dir):
    from gemmsql.streaming.windows import streaming_join_gate

    return streaming_join_gate(spark, sf_dir)


def _streaming_join_rot_sql():
    from gemmsql.streaming.windows import STREAMING_JOIN_GATE_SQL

    return STREAMING_JOIN_GATE_SQL


def _web_dedup_rot(spark, sf_dir):
    from gemmsql.pipeline.urls import web_dedup_pipeline

    return web_dedup_pipeline(spark, sf_dir)


def _web_dedup_rot_sql():
    from gemmsql.pipeline.urls import WEB_DEDUP_PIPELINE_SQL

    return WEB_DEDUP_PIPELINE_SQL


def _cdf_ivm_rollup_rot(spark, sf_dir):
    from gemmsql.pipeline.tablelog import cdf_ivm_rollup

    return cdf_ivm_rollup(spark, sf_dir)


def _cdf_ivm_rollup_rot_sql():
    from gemmsql.pipeline.tablelog import cdf_ivm_rollup_sql

    return cdf_ivm_rollup_sql(SF_SMOKE)


def _pruned_scan_rot(spark, sf_dir):
    from gemmsql.pipeline.tablelog import pruned_scan_read

    return pruned_scan_read(spark, sf_dir)


def _pruned_scan_rot_sql():
    from gemmsql.pipeline.tablelog import pruned_scan_read_sql

    return pruned_scan_read_sql(SF_SMOKE)


def _version_diff_rot(spark, sf_dir):
    from gemmsql.pipeline.tablelog import version_diff

    return version_diff(spark, sf_dir)


def _version_diff_rot_sql():
    from gemmsql.pipeline.tablelog import version_diff_sql

    return version_diff_sql(SF_SMOKE)


def _dedup_incremental_rot(spark, sf_dir):
    from gemmsql.pipeline.dedup import dedup_incremental_corpus

    return dedup_incremental_corpus(spark, sf_dir)


def _dedup_incremental_rot_sql():
    from gemmsql.pipeline.dedup import dedup_incremental_sql

    return dedup_incremental_sql()


def _streaming_partition_ivm(spark, sf_dir):
    from gemmsql.pipeline.tablelog import streaming_partition_ivm_gate

    return streaming_partition_ivm_gate(spark, sf_dir)


def _streaming_partition_ivm_sql():
    from gemmsql.pipeline.tablelog import STREAMING_PARTITION_IVM_GATE_SQL

    return STREAMING_PARTITION_IVM_GATE_SQL


def _posdel_compaction_read(spark, sf_dir):
    from gemmsql.pipeline.tablelog import posdel_compaction_read

    return posdel_compaction_read(spark, sf_dir)


def _posdel_compaction_read_sql():
    from gemmsql.pipeline.tablelog import POSDEL_COMPACTION_READ_SQL

    return POSDEL_COMPACTION_READ_SQL


def _mor_dml_read(spark, sf_dir):
    from gemmsql.pipeline.tablelog import mor_dml_read

    return mor_dml_read(spark, sf_dir)


def _mor_dml_read_sql():
    from gemmsql.pipeline.tablelog import MOR_DML_READ_SQL

    return MOR_DML_READ_SQL


def _streaming_dml_ivm(spark, sf_dir):
    from gemmsql.pipeline.tablelog import streaming_dml_ivm_gate

    return streaming_dml_ivm_gate(spark, sf_dir)


def _streaming_dml_ivm_sql():
    from gemmsql.pipeline.tablelog import STREAMING_DML_IVM_GATE_SQL

    return STREAMING_DML_IVM_GATE_SQL


def _partition_mor_dml_read(spark, sf_dir):
    from gemmsql.pipeline.tablelog import partition_mor_dml_read

    return partition_mor_dml_read(spark, sf_dir)


def _partition_mor_dml_read_sql():
    from gemmsql.pipeline.tablelog import PARTITION_MOR_DML_READ_SQL

    return PARTITION_MOR_DML_READ_SQL


def _part_communities_rot(spark, sf_dir):
    from gemmsql.pipeline.graph import part_communities

    return part_communities(spark, sf_dir)


def _part_communities_rot_sql():
    from gemmsql.pipeline.graph import PART_COMMUNITIES_SQL

    return PART_COMMUNITIES_SQL


def _item_similarity_rot(spark, sf_dir):
    from gemmsql.pipeline.graph import item_similarity

    return item_similarity(spark, sf_dir)


def _item_similarity_rot_sql():
    from gemmsql.pipeline.graph import ITEM_SIMILARITY_SQL

    return ITEM_SIMILARITY_SQL


def _streaming_sessionize_rot(spark, sf_dir):
    from gemmsql.streaming.windows import streaming_sessionize_gate

    return streaming_sessionize_gate(spark, sf_dir)


def _streaming_sessionize_rot_sql():
    from gemmsql.streaming.windows import STREAMING_SESSIONIZE_GATE_SQL

    return STREAMING_SESSIONIZE_GATE_SQL


def _streaming_hourly_rot(spark, sf_dir):
    from gemmsql.streaming.windows import streaming_hourly_gate

    return streaming_hourly_gate(spark, sf_dir)


def _streaming_hourly_rot_sql():
    from gemmsql.streaming.windows import STREAMING_HOURLY_GATE_SQL

    return STREAMING_HOURLY_GATE_SQL


def _rotated():
    from gemmsql.pipeline import (
        cluster,
        corpus,
        dedup,
        dsir,
        events,
        flac,
        graph,
        html,
        joins,
        jsonlgz,
        relational,
        retrieval,
        similarity,
        text,
        video,
    )

    return [
        ("quiet_customers", relational.quiet_customers,
         relational.QUIET_CUSTOMERS_SQL),
        ("returning_customers", relational.returning_customers,
         relational.RETURNING_CUSTOMERS_SQL),
        ("order_priority_pivot", relational.order_priority_pivot,
         relational.ORDER_PRIORITY_PIVOT_SQL),
        ("props_stats", events.props_stats, events.PROPS_STATS_SQL),
        ("user_value_movavg", events.user_value_movavg,
         events.USER_VALUE_MOVAVG_SQL),
        # rotated out in round 4 for the corpus ops
        ("top_orders_per_customer", relational.top_orders_per_customer,
         relational.TOP_ORDERS_SQL),
        ("sales_rollup", relational.sales_rollup,
         relational.SALES_ROLLUP_SQL),
        ("high_value_customers", relational.high_value_customers,
         relational.HIGH_VALUE_CUSTOMERS_SQL),
        ("time_since_last_error", events.time_since_last_error,
         events.TIME_SINCE_LAST_ERROR_SQL),
        # rotated out for chain_grads (the exact O(N^2) twin;
        # embedding_dups_lsh — the scale path — stays driver-gated)
        ("embedding_dups",
         lambda spark, sf: similarity.embedding_dups(spark, sf, threshold=0.4),
         similarity.EMBEDDING_DUPS_SQL),
        # rotated out for ivfpq_topk (hourly_event_stats keeps the
        # windowed-agg shape in the gate)
        ("sliding_event_counts", events.sliding_event_counts,
         events.SLIDING_EVENT_COUNTS_SQL),
        # rotated out for kmeans_assign_step / pca_moments
        ("user_activity_profile", events.user_activity_profile,
         events.USER_ACTIVITY_PROFILE_SQL),
        ("segment_quantiles", relational.segment_quantiles,
         relational.SEGMENT_QUANTILES_SQL),
        # rotated out late in r4 for bpe_pair_counts / dsir_weights /
        # streaming_stateful_gate (green r1-r3)
        ("shipping_priority", relational.shipping_priority,
         relational.SHIPPING_PRIORITY_SQL),
        ("nation_revenue", relational.nation_revenue,
         relational.NATION_REVENUE_SQL),
        ("price_band_join", relational.price_band_join,
         relational.PRICE_BAND_JOIN_SQL),
        # rotated out for bm25_topk / dedup_keep_best: the batch
        # sessionize + hourly pair — their windowed/gaps-and-islands
        # semantics stay driver-gated through the streaming gates'
        # oracles
        ("sessionize", events.sessionize, events.SESSIONIZE_SQL),
        ("hourly_event_stats", events.hourly_event_stats,
         events.HOURLY_EVENT_STATS_SQL),
        # rotated out in round 5 for doc_perplexity / dup_spans /
        # mixture_balance / bloom_decontaminate (green r1-r4)
        ("dedup_exact", dedup.dedup_exact, dedup.DEDUP_EXACT_SQL),
        ("simhash", dedup.simhash, dedup.simhash_sql()),
        ("fingerprints", text.fingerprints, text.FINGERPRINTS_SQL),
        ("language_scores", text.language_scores,
         text.language_scores_sql()),
        # rotated out in round 5 for payload_features (the real-decode
        # multimodal gate)
        ("stratified_sample", text.stratified_sample,
         text.stratified_sample_sql()),
        # rotated out in round 5 for chain2_grads (the second
        # gradient-composition gate)
        ("quality_score", text.quality_score, text.quality_score_sql()),
        # rotated out in round 5 for pii_scrub_corpus /
        # dedup_incremental (the corpus-scale oracles, VERDICT r4
        # next #5/#6)
        ("tfidf_top_terms", text.tfidf_top_terms,
         text.TFIDF_TOP_TERMS_SQL),
        ("corpus_profile", text.corpus_profile,
         text.CORPUS_PROFILE_SQL),
        # rotated out late in round 5 for the new north-star ops
        # (doc_chunks, quality_classifier, mixture_temperature,
        # corpus_diff, sampling_filtered).  jaccard_pairs is the exact
        # verification tier of the gated minhash_lsh_pairs;
        # decontaminate's scale path (bloom_decontaminate) stays gated.
        ("pricing_summary", relational.pricing_summary,
         relational.PRICING_SUMMARY_SQL),
        ("brand_sales_cube", relational.brand_sales_cube,
         relational.BRAND_SALES_CUBE_SQL),
        ("jaccard_pairs", dedup.jaccard_pairs,
         dedup.jaccard_pairs_sql()),
        ("decontaminate", dedup.decontaminate,
         dedup.decontaminate_sql()),
        ("user_reach_sketch", _sketch_rotated,
         _sketch_rotated_sql()),
        # rotated out in round 6 for the six promoted late-r5 ops
        # (corpus_upsert, training_order, audio_features, funnel_counts,
        # cohort_retention, cm_heavy_hitters) plus png_features:
        # text_stats / last_order_before_event / cosine_topk / lsh_topk
        # green r1-r5; payload_meta / pq_codes / bpe_pair_counts green
        # r4-r5.  cosine_topk stays the exact-verification twin of the
        # gated IVF/PQ scale paths; payload_meta keeps the metadata-
        # only (never-decode) scan shape pinned here.
        ("text_stats", _entry("q_text_stats"), text.TEXT_PROFILE_SQL),
        ("last_order_before_event", joins.last_order_before_event,
         joins.LAST_ORDER_BEFORE_EVENT_SQL),
        ("cosine_topk", _entry("q_cosine_topk"),
         similarity.COSINE_TOPK_SQL),
        ("lsh_topk", _entry("q_lsh_topk"), similarity.LSH_TOPK_SQL),
        ("payload_meta", _payload_meta, _payload_meta_sql()),
        ("pq_codes", _entry("q_pq_codes"), similarity.PQ_CODES_SQL),
        ("bpe_pair_counts", _bpe_pair_counts, _bpe_pair_counts_sql()),
        # rotated out in round 6 for streaming_outer_join_gate (the
        # LEFT OUTER stream-stream join, whose null-side emission is
        # the least-proven streaming surface); the stream-static
        # broadcast-enrich path keeps its full hash gate HERE — the
        # gate fn replays the real availableNow stream
        ("streaming_enrich_gate", _streaming_enrich, _streaming_enrich_sql()),
        # born into this tier in round 6 (registry full): the video
        # frame-sampling shape made oracle-verifiable — the gated
        # payload corpus through the REAL sample_frames fan-out, each
        # 32-byte frame reduced to exact byte stats; the DuckDB twin
        # re-derives every sampled byte by payload offset (header chars
        # by string position, body bytes from the md5 chain), so the
        # sampler's offset arithmetic itself is hash-gated
        ("frame_stats", _frame_stats, _frame_stats_sql()),
        # resize made oracle-verifiable the same way: the corpus
        # through the REAL resize_images (decode -> nearest-neighbor
        # sample -> re-encode) at 8x8, re-decoded and reduced; the
        # twin re-derives each sampled pixel via the identical index
        # map, gating the resize arithmetic AND the codec round-trip
        ("resize_stats", _resize_stats, _resize_stats_sql()),
        # rotated out late in round 6 for the graph tier
        # (triangle_count, pagerank_step), the histogram quantile
        # sketch (hist_quantiles) and the interval range join
        # (concurrent_orders): minhash_lsh_pairs / dedup_clusters
        # green r1-r5 (keep-best + incremental keep the dedup chain
        # gated); ivf_topk / pq_topk green r3/r4-r5 (ivfpq_topk
        # composes both ANN scale paths)
        ("minhash_lsh_pairs", dedup.minhash_lsh_pairs,
         dedup.minhash_lsh_pairs_sql()),
        ("dedup_clusters", dedup.dedup_clusters,
         dedup.dedup_clusters_sql()),
        ("ivf_topk", _entry("q_ivf_topk"), similarity.IVF_TOPK_SQL),
        ("pq_topk", _entry("q_pq_topk"), similarity.PQ_TOPK_SQL),
        # rotated out late in round 6 for jpeg_features (the lossy
        # compressed-format decode gate), green r3-r5; the embedding
        # near-dup surface stays driver-gated via semantic_dups
        ("embedding_dups_lsh", _entry("q_embedding_dups_lsh"),
         similarity.EMBEDDING_DUPS_LSH_SQL),
        # (the six ops born into this tier late in round 6 —
        # item_similarity, part_communities, time_rollup,
        # triangle_count_exact, jpeg_color_features, basket_rules —
        # were promoted to the driver gate in round 7 and are now
        # hash-checked by tests/test_gate_parity.py instead)
        # rotated out in round 7 for the promotions plus pagerank_iter3
        # and flac_features: each hash-green in CORRECTNESS r4-r6
        ("bigram_pmi", text.bigram_pmi, text.BIGRAM_PMI_SQL),
        ("cell_profile", similarity.cell_profile,
         similarity.CELL_PROFILE_SQL),
        ("kmeans_assign_step", cluster.kmeans_assign_step,
         cluster.KMEANS_ASSIGN_STEP_SQL),
        ("pca_moments", cluster.pca_moments, cluster.PCA_MOMENTS_SQL),
        # (bm25_topk / dedup_keep_best / dsir_weights / semantic_dups
        # promoted BACK to the driver gate in round 9 — VERDICT r8
        # next #2; hash-checked by tests/test_gate_parity.py now)
        # rotated out in the round-7 second swap for concurrent_events
        # (the keyless interval join) and streaming_hist_gate
        ("repetition_stats", _entry("q_repetition_stats"),
         text.REPETITION_PROFILE_SQL),
        ("vocab_build", text.vocab_build, text.VOCAB_BUILD_SQL),
        # rotated out in the round-7 third swap for adpcm_features and
        # video_features (green r5-r6): the UNCOMPRESSED image/audio
        # tiers — every driver-gated multimodal entry now rides a real
        # compressed codec or container; the raw-PPM / raw-WAV decode
        # paths keep their full hash gates here
        ("payload_features", _payload_features, _payload_features_sql()),
        ("audio_features", _audio_features, _audio_features_sql()),
        # rotated out in the round-7 fourth swap for
        # streaming_dedup_gate (the 7th streaming gate): green r5-r6
        ("doc_chunks", _doc_chunks, _doc_chunks_sql()),
        # rotated out in the round-7 fifth swap for html_extract
        # (green r4-r6; both are regex-hygiene narrow maps — the
        # PII-injected corpus scrub keeps its full hash gate here)
        ("pii_scrub_corpus", _pii_scrub_corpus, _pii_scrub_corpus_sql()),
        # rotated out in the round-7 sixth swap for kmv_reach (the
        # fifth sketch family): green r4-r6, mixture_temperature
        # keeps the mixture family gated
        ("mixture_balance", _mixture_balance, _mixture_balance_sql()),
        # (jsonl_gz_ingest, born into this tier in round 7, was
        # promoted to the driver gate in round 9 — VERDICT r8 next #2)
        # rotated out in round 9 for the jsonl_gz_ingest promotion and
        # the four returning rotation entries: each green in at least
        # FOUR consecutive driver rounds (r5-r8)
        ("dup_spans", dedup.dup_spans, dedup.DUP_SPANS_SQL),
        ("doc_perplexity", text.doc_perplexity, text.DOC_PERPLEXITY_SQL),
        ("bloom_decontaminate", _entry("_bloom_decontaminate_query"),
         _bloom_decontaminate_sql()),
        ("sampling_filtered", _entry("q_sampling_filtered"),
         _sampling_filtered_sql()),
        ("mixture_temperature", text.mixture_temperature,
         text.MIXTURE_TEMPERATURE_SQL),
        # (the seven round-9/10 births — flac_stereo_features,
        # parquet_footer_stats, user_value_gapfill, corpus_scd2,
        # mp3_frame_stats, dq_orders_quarantine, streaming_dq_gate —
        # were promoted to the driver gate in round 11 (VERDICT r10
        # next #1, the LAST promotion cohort) and are now hash-checked
        # by tests/test_gate_parity.py / tests/test_streaming.py)
        # rotated out in round 10 for the seven r9-birth promotions
        # (VERDICT r9 next #1/#2/#6).  triangle_count_exact is the
        # deliberately-unsampled O(m^1.5) oracle-tier wedge join whose
        # sampled production twin (triangle_count) stays driver-gated;
        # html_extract green r7-r9; jsonl_gz_ingest green rotation
        # r7-r8 + driver r9 (the container tier stays gated via
        # warc_ingest + tar_shard_ingest); corpus_diff/corpus_upsert
        # green r5-r9 (training_order keeps the family gated);
        # flac_features/video_features green r7-r9 (the SAME codecs
        # stay gated through the splittable-reader frame-stats gates)
        ("triangle_count_exact", graph.triangle_count,
         graph.TRIANGLE_COUNT_EXACT_SQL),
        ("html_extract", html.html_extract_corpus, html.HTML_EXTRACT_SQL),
        ("jsonl_gz_ingest", jsonlgz.jsonl_gz_ingest,
         jsonlgz.JSONL_GZ_INGEST_SQL),
        ("corpus_diff", corpus.corpus_diff, corpus.CORPUS_DIFF_SQL),
        ("corpus_upsert", corpus.corpus_upsert, corpus.CORPUS_UPSERT_SQL),
        ("flac_features", flac.flac_features, flac.FLAC_FEATURES_SQL),
        ("video_features", video.video_features, video.VIDEO_FEATURES_SQL),
        # rotated out in round 11 for the last promotion cohort
        # (VERDICT r10 next #1) — each green in 4-5 consecutive driver
        # rounds: time_rollup (r7-r10), cohort_retention / funnel_counts
        # / training_order (r6-r10), hist_quantiles / cm_heavy_hitters
        # (r6/r7-r10), kmv_reach (r7-r10).  The families stay
        # driver-gated: events via user_value_gapfill, corpus
        # versioning via corpus_scd2, and all five sketch families
        # keep their identical hash gates here.
        ("time_rollup", events.time_rollup, events.TIME_ROLLUP_SQL),
        ("cohort_retention", events.cohort_retention,
         events.COHORT_RETENTION_SQL),
        ("funnel_counts", events.funnel_counts, events.FUNNEL_COUNTS_SQL),
        ("training_order", corpus.training_order,
         corpus.TRAINING_ORDER_SQL),
        ("hist_quantiles", _hist_quantiles, _hist_quantiles_sql()),
        ("cm_heavy_hitters", _cm_heavy_hitters, _cm_heavy_hitters_sql()),
        ("kmv_reach", _kmv_reach, _kmv_reach_sql()),
        # (nine of the ten round-11 births — dq_orders_quarantine_full,
        # streaming_quarantine_gate, zorder_audit, compaction_audit,
        # zip_shard_ingest, bpe_tokenize, url_canonical,
        # event_order_asof, curation_pipeline — were promoted to the
        # driver gate in round 12 (VERDICT r11 next #1) and are now
        # hash-checked by tests/test_gate_parity.py)
        # layout_audit stays HERE by design: zorder_audit subsumes its
        # single-key row-group-disjointness check with the stricter
        # multi-dimension stat-width audit, so the simpler boolean
        # formulation keeps its rotation gate instead of a driver slot
        ("layout_audit", _layout_audit, _layout_audit_sql()),
        # rotated out in round 12 for the r11-birth promotions — the
        # ingest-container incumbents (green rotation r9 + driver
        # r10-r11; the container tier stays driver-gated via
        # zip_shard_ingest, the strictest member-walk discipline:
        # central-directory index + CRC-32 + both compression modes)
        ("warc_ingest", _warc_ingest, _warc_ingest_sql()),
        ("tar_shard_ingest", _tar_shard_ingest, _tar_shard_ingest_sql()),
        # the codec incumbents (green rotation r9 + driver r10-r11;
        # the dictionary-coding and MP3-walk families keep their full
        # hash gates here, and MP3 decode stays driver-gated via the
        # splittable mp3_frame_stats)
        ("gif_anim_features", _gif_anim_features, _gif_anim_features_sql()),
        ("mp3_stream_stats", _mp3_stream_stats, _mp3_stream_stats_sql()),
        # the DQ report + row-rules quarantine (green r10-r11/r11;
        # superseded in the gate by dq_orders_quarantine_full, which
        # runs the same fused single-scan rule suite and emits the
        # violating rows the report only counts — the report's
        # aggregate shape stays driver-gated via streaming_dq_gate)
        ("dq_orders_report", _dq_orders_report, _dq_orders_report_sql()),
        ("dq_orders_quarantine", _dq_orders_quarantine,
         _dq_orders_quarantine_sql()),
        # pagerank_step (green r6-r11): pagerank_iter3 composes the
        # identical kernel three times, so the step stays driver-gated
        # through it — the triangle_count_exact argument from r10
        ("pagerank_step", _pagerank_step, _pagerank_step_sql()),
        # basket_rules (green r7-r11; item_similarity keeps the
        # co-occurrence family driver-gated) and concurrent_events
        # (green r7-r11; concurrent_orders keeps the interval family
        # driver-gated, and the as-of family gains event_order_asof)
        ("basket_rules", _basket_rules, _basket_rules_sql()),
        ("concurrent_events", _concurrent_events, _concurrent_events_sql()),
        # (zip_split_ingest — born r12 — was promoted to the driver
        # gate in round 15; the whole-shard walk zip_shard_ingest,
        # green r12-r14, rotated back HERE with the splittable path
        # taking the driver slot)
        ("zip_shard_ingest", _zip_shard_ingest_rot,
         _zip_split_ingest_sql()),
        # (web_dedup_pipeline, streaming_asof_gate, time_travel_read,
        # version_diff, cdf_ivm_rollup, streaming_ivm_gate,
        # pruned_scan_read, sketch_store_rollup, and avro_split_ingest
        # — all born into this tier in round 12 — were promoted to the
        # driver gate in round 13 (VERDICT r12 next #1) and are now
        # hash-checked by tests/test_gate_parity.py)
        # (table_history_audit, stats_skipping_audit, and
        # streaming_tablelog_gate — the rest of the r12 table-format
        # births — were promoted to the driver gate in round 14
        # (VERDICT r13 next #1) and are now hash-checked by
        # tests/test_gate_parity.py)
        # (sample_quantiles and qoi_features — born r12 — were
        # promoted to the driver gate in round 15 (VERDICT r14 next
        # #2) and are now hash-checked by tests/test_gate_parity.py)
        # (the TFRecord trio — tfrecord_ingest, tfrecord_split_ingest,
        # and streaming_shard_ingest_gate — was promoted to the driver
        # gate in round 14 and is now hash-checked by
        # tests/test_gate_parity.py)
        # (the Ogg pair — ogg_shard_ingest + ogg_split_ingest, born
        # r12 — was promoted to the driver gate in round 15 and is
        # now hash-checked by tests/test_gate_parity.py)
        # the SIXTH shard container: Avro OCF (public spec) — zigzag
        # varint binary encoding built from the spec's own vectors,
        # metadata map with REQUIRED schema match and null-codec
        # enforcement, per-block count/size accounting, every sync
        # marker checked against the header's; ingest recovers all
        # columns from the container walk, twin from documents;
        # vectors + corruption fuzz in tests/test_avro.py
        # (avro_shard_ingest — born r12 — was promoted to the driver
        # gate in round 15; its splittable path avro_split_ingest was
        # promoted in round 13 and rotated back HERE in round 15 with
        # the shard walk taking the driver slot)
        ("avro_split_ingest", _avro_split_ingest_rot,
         _avro_shard_ingest_sql()),
        # rotated out in round 13 for the r12-birth promotions —
        # each keeps the identical hash gate here:
        # parquet_footer_stats (green r9-r12; the Thrift footer parser
        # stays driver-gated through zorder_audit + compaction_audit,
        # which are built on it)
        ("parquet_footer_stats", _parquet_footer_stats,
         _parquet_footer_stats_sql()),
        # corpus_scd2 / user_value_gapfill (green r11-r12; corpus
        # versioning stays via curation_pipeline, events via the
        # streaming tier)
        ("corpus_scd2", corpus.corpus_scd2, corpus.CORPUS_SCD2_SQL),
        ("user_value_gapfill", events.user_value_gapfill,
         events.USER_VALUE_GAPFILL_SQL),
        # mp3_frame_stats / flac_stereo_features (green r11-r12; the
        # codec matrix stays driver-gated via flac_frame_stats /
        # avi_frame_stats and PNG/JPEG-color/ADPCM)
        ("mp3_frame_stats", _mp3_frame_stats_rot,
         _mp3_frame_stats_rot_sql()),
        ("flac_stereo_features", flac.flac_stereo_features,
         flac.FLAC_STEREO_FEATURES_SQL),
        # concurrent_orders (green r6-r12; event_order_asof keeps the
        # interval family driver-gated)
        ("concurrent_orders", joins.concurrent_orders,
         joins.CONCURRENT_ORDERS_SQL),
        # pagerank_iter3 / triangle_count (green r6/r7-r12 — the
        # longest-proven graph incumbents; part_communities +
        # item_similarity keep the tier driver-gated)
        ("pagerank_iter3", graph.pagerank_iter3,
         graph.PAGERANK_ITER3_SQL),
        ("triangle_count", graph.triangle_count_gate,
         graph.TRIANGLE_COUNT_SQL),
        # jpeg_features (green r5-r12; the JPEG codec stays
        # driver-gated via jpeg_color_features, whose YCbCr 4:2:0
        # path composes the same luma DC chain plus chroma)
        ("jpeg_features", _jpeg_features_rot, _jpeg_features_rot_sql()),
        # (tablelog_merge and streaming_cdf_ivm_gate — the r13
        # tablelog births — were promoted to the driver gate in
        # round 14 and are now hash-checked by test_gate_parity.py)
        # (segment_value_quantiles — born r13 — was promoted to the
        # driver gate in round 15 alongside sample_quantiles)
        # also born in round 13: the SEVENTH shard container — Hadoop
        # SequenceFile (public format), the container that INVENTED
        # the sync-escape split pattern.  From-scratch Hadoop
        # VInt/VLong (the third wire family after zigzag varints and
        # fixed-LE), Text framing, version-6 header with class-name
        # and compression enforcement, record/key length accounting,
        # every escape verified; the FIRST container built entirely
        # on the shared split spine (shardsplit.py) — the r12 #8
        # factoring's proof case.  Same documents-derived twin for
        # both paths; VInt vectors + corruption fuzz + fragment
        # rejection in tests/test_seqfile.py
        # (the SequenceFile pair — seqfile_shard_ingest +
        # seqfile_split_ingest, born r13 — was promoted to the
        # driver gate in round 15 EARLY per VERDICT r14 next #6,
        # completing driver coverage of every container; both are
        # now hash-checked by tests/test_gate_parity.py)
        # (mor_delete_read — the r13 merge-on-read birth — was
        # promoted to the driver gate in round 14)
        # (image_near_dups — born r13 — was promoted to the driver
        # gate in round 15 and is now hash-checked by
        # tests/test_gate_parity.py)
        # (bloom_skipping_audit and streaming_txn_sink_gate — the last
        # two r13 tablelog births — were promoted to the driver gate
        # in round 14, completing the tier's driver coverage)
        # rotated out in round 14 for the r14 eleven-query promotion
        # cohort — each keeps the identical hash gate here:
        # url_canonical / bpe_tokenize / curation_pipeline /
        # dq_orders_quarantine_full / zorder_audit / compaction_audit
        # / event_order_asof (green r12-r13; the text tier stays
        # driver-gated via quality_classifier, dsir_weights, bm25_topk
        # and web_dedup_pipeline; the DQ tier via streaming_dq_gate +
        # streaming_quarantine_gate; the layout story via
        # pruned_scan_read + stats_skipping_audit; the as-of family
        # via streaming_asof_gate)
        ("url_canonical", _url_canonical_rot, _url_canonical_rot_sql()),
        ("bpe_tokenize", _bpe_tokenize_rot, _bpe_tokenize_rot_sql()),
        ("curation_pipeline", corpus.curation_pipeline,
         corpus.CURATION_PIPELINE_SQL),
        ("dq_orders_quarantine_full", _dq_quarantine_full_rot,
         _dq_quarantine_full_rot_sql()),
        ("zorder_audit", _zorder_audit_rot, _zorder_audit_rot_sql()),
        ("compaction_audit", _compaction_audit_rot,
         _compaction_audit_rot_sql()),
        ("event_order_asof", joins.event_order_asof,
         joins.EVENT_ORDER_ASOF_SQL),
        # dedup_keep_best (green r6-r13 — among the longest-proven
        # incumbents; the LSH->cluster->canonicalize chain stays
        # driver-gated via dedup_incremental + web_dedup_pipeline)
        ("dedup_keep_best", _dedup_keep_best_rot,
         _dedup_keep_best_rot_sql()),
        # png_features (green r4-r13) and adpcm_features (green
        # r6-r13); the codec matrix stays driver-gated via
        # jpeg_color_features and the FLAC/AVI splittable readers
        ("png_features", _png_features_rot, _png_features_rot_sql()),
        ("adpcm_features", _adpcm_features_rot,
         _adpcm_features_rot_sql()),
        # streaming_hist_gate (green r8-r13; the windowed-histogram
        # shape stays represented via streaming_hourly_gate and
        # streaming_dq_gate)
        ("streaming_hist_gate", _streaming_hist_rot,
         _streaming_hist_rot_sql()),
        # (column_mapping_read and streaming_mor_ivm_gate — the two
        # r14 births — were promoted to the driver gate in round 15;
        # column_mapping_read is hash-checked by
        # tests/test_gate_parity.py and the streaming MOR-IVM
        # composition keeps its full replay parity in
        # tests/test_streaming.py)
        # rotated out in round 15 for the ten-query r15 promotion
        # cohort (VERDICT r14 next #2) — each keeps the identical
        # hash gate here.  semantic_dups (green r4-r14) and
        # dsir_weights (r4-r14): the longest-proven pipeline
        # incumbents; the embedding near-dup family stays
        # driver-gated via ivfpq_topk + image_near_dups, text
        # selection via bm25_topk + web_dedup_pipeline
        ("semantic_dups", _semantic_dups_rot, _semantic_dups_rot_sql()),
        ("dsir_weights", _dsir_weights_rot, _dsir_weights_rot_sql()),
        # quality_classifier (green r5-r14): the model-based filter
        # tier's hashing-trick scorer
        ("quality_classifier", _quality_classifier_rot,
         _quality_classifier_rot_sql()),
        # jpeg_color_features (green r7-r14) and flac_frame_stats
        # (green r10-r14): the codec matrix stays driver-gated via
        # qoi_features and avi_frame_stats (whose MJPEG path decodes
        # a real JPEG per sampled frame); FLAC decode keeps its
        # whole-file gates here too (flac_features,
        # flac_stereo_features)
        ("jpeg_color_features", _jpeg_color_features_rot,
         _jpeg_color_features_rot_sql()),
        ("flac_frame_stats", _flac_frame_stats_rot,
         _flac_frame_stats_rot_sql()),
        # time_travel_read (green r13-r14): versioned reads stay
        # driver-gated via version_diff / cdf_ivm_rollup /
        # column_mapping_read
        ("time_travel_read", _time_travel_read_rot,
         _time_travel_read_rot_sql()),
        # sketch_store_rollup (green r13-r14): the persisted-HLL
        # store; the sketch tier's driver slots pass to the bottom-k
        # paired sample pair
        ("sketch_store_rollup", _sketch_store_rollup_rot,
         _sketch_store_rollup_rot_sql()),
        # streaming_join_gate (green r3-r14 — the longest-proven
        # streaming incumbent): the full availableNow replay keeps
        # its hash gate HERE; the stream-stream join machinery stays
        # driver-gated via streaming_outer_join_gate
        ("streaming_join_gate", _streaming_join_rot,
         _streaming_join_rot_sql()),
        # web_dedup_pipeline and cdf_ivm_rollup (green r13-r14):
        # rotated out for the EARLY seqfile promotion (VERDICT r14
        # next #6).  The web-ingest composition keeps its two-shuffle
        # plan pin and this hash gate; cdf_ivm_rollup's direct-v3
        # oracle still drives streaming_ivm_gate AND
        # streaming_cdf_ivm_gate in the live registry every round
        ("web_dedup_pipeline", _web_dedup_rot, _web_dedup_rot_sql()),
        ("cdf_ivm_rollup", _cdf_ivm_rollup_rot,
         _cdf_ivm_rollup_rot_sql()),
        # (the four round-15 births — partition_pruning_read,
        # streaming_mapped_ivm_gate, partition_transform_read,
        # type_widening_read — PROMOTED to the driver gate in round
        # 16, VERDICT r15 next #1; their hash gates now live in
        # tests/test_gate_parity.py like every active entry)
        # rotated out r16 (green r13-r15): the log-stats skip-plan
        # witness; the skip story stays driver-gated via
        # stats_skipping_audit + bloom_skipping_audit and
        # partition_pruning_read
        ("pruned_scan_read", _pruned_scan_rot, _pruned_scan_rot_sql()),
        # rotated out r16 (green r13-r15): the batch CDF across the
        # compaction commit; the algebra stays driver-gated via the
        # two streaming IVM gates sharing the direct-latest oracle
        ("version_diff", _version_diff_rot, _version_diff_rot_sql()),
        # rotated out r16 (green r5-r15 — among the longest-proven
        # pipeline incumbents): the snapshot/delta incremental dedup;
        # exact+near dedup stays driver-gated via image_near_dups
        ("dedup_incremental", _dedup_incremental_rot,
         _dedup_incremental_rot_sql()),
        # rotated out r16 (green r1-r15 — the longest-proven
        # streaming incumbent): the watermarked hourly windowed agg's
        # full availableNow replay keeps its hash gate HERE
        ("streaming_hourly_gate", _streaming_hourly_rot,
         _streaming_hourly_rot_sql()),
        # (the three r16 births — streaming_partition_ivm_gate,
        # posdel_compaction_read, mor_dml_read — promoted to the
        # driver gate in r17; their live parity runs in
        # tests/test_gate_parity.py every pytest sweep)
        # born in round 17: the DV-DML MATRIX composed with the live
        # streaming IVM — update_where_mor + merge_table_mor land
        # mid-stream (drain 2 recovers from only those commits),
        # then delete_positions_mor before drain 3; the maintained
        # view must equal the batch recompute from orders, so a
        # double-applied update, lost insert, or resurrected delete
        # moves the hash.  Slated for promotion r18.
        ("streaming_dml_ivm_gate", _streaming_dml_ivm,
         _streaming_dml_ivm_sql()),
        # second round-17 birth: partitions × DV-DML through the
        # oracle — a partition-routed DV-UPDATE (prices) then a
        # partition-MOVING DV-UPDATE (assigns the spec column); the
        # gate reads every partition through partition_pruned_read,
        # which must prune AND subtract the live DVs (the r17
        # pruned-reader MOR fix), plus the delete-file count.
        # Slated for promotion r18.
        ("partition_mor_dml_read", _partition_mor_dml_read,
         _partition_mor_dml_read_sql()),
        # rotated out r17 (green r7-r16 — the longest-proven batch
        # pipeline incumbents): the graph tier's star-contraction
        # connected components and the item-item Jaccard top-k keep
        # their identical hash gates HERE; triangle_count_exact and
        # pagerank_step already gate the tier's other members below
        ("part_communities", _part_communities_rot,
         _part_communities_rot_sql()),
        ("item_similarity", _item_similarity_rot,
         _item_similarity_rot_sql()),
        # rotated out r17 (green r2-r16 — the longest-proven
        # streaming incumbent left): the session_window state
        # machine's full availableNow replay keeps its hash gate
        # HERE; user-defined streaming state stays driver-gated via
        # streaming_stateful_gate
        ("streaming_sessionize_gate", _streaming_sessionize_rot,
         _streaming_sessionize_rot_sql()),
    ]


@pytest.mark.parametrize(
    "name,fn,sql",
    _rotated(),
    ids=[r[0] for r in _rotated()],
)
def test_rotated_query_matches_oracle(spark, duck, name, fn, sql):
    sdf = fn(spark, SF_SMOKE).toPandas()
    odf = duck.execute(sql).df()
    assert len(sdf) == len(odf), name
    assert sorted(sdf.columns) == sorted(odf.columns), name
    assert _hash(sdf) == _hash(odf), f"{name}: value hash mismatch"
