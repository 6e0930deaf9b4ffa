package graft

import graft.run.GraftQueries
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] runs a real engine code path (Catalyst cell
  * encoders, JTS refine, scanline burn, ring-expansion kNN, ...); every
  * entry in [[oracleSql]] recomputes the same result relationally in
  * DuckDB-executable ANSI SQL over the same parquet tables.
  */
object SparkEntry {

  /** Flagship: full web-table pipeline at sf=0.001 scale — synthesize the
    * Common-Crawl-style table, verify the byte-identical text invariant,
    * geocode, BNG-index, lookup-join lang codes, count per 10 km tile.
    */
  def entry(spark: SparkSession): DataFrame =
    graft.run.Pipeline.flagship(spark, nPages = 20000L)

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (GraftQueries.q1Agg _),
    "q2_join_broadcast" -> (GraftQueries.q2Join _),
    "q3_filter_pushdown" -> (GraftQueries.q3Filter _),
    "q4_window_topk" -> (GraftQueries.q4Window _),
    "q5_sort_limit" -> (GraftQueries.q5SortLimit _),
    "q6_categorize" -> (GraftQueries.q6Categorize _),
    "q7_lookup_join" -> (GraftQueries.q7LookupJoin _),
    "q8_dedup_exact" -> (GraftQueries.q8DedupExact _),
    "q9_hourly_agg" -> (GraftQueries.q9Hourly _),
    "q10_text_quality" -> (GraftQueries.q10TextQuality _),
    "q11_fingerprint" -> (GraftQueries.q11Fingerprint _),
    "q12_bng_cell" -> (GraftQueries.q12BngCell _),
    "q13_tile_counts" -> (GraftQueries.q13TileCounts _),
    "q14_spatial_join" -> (GraftQueries.q14SpatialJoin _),
    "q15_knn" -> (GraftQueries.q15Knn _),
    "q16_raster_burn" -> (GraftQueries.q16RasterBurn _),
    "q17_ann_topk" -> (GraftQueries.q17AnnDot _),
    "q18_semi_anti_join" -> (GraftQueries.q18SemiAnti _),
    "q19_set_ops" -> (GraftQueries.q19SetOps _),
    "q20_minhash_lsh" -> (GraftQueries.q20Minhash _),
    "q21_simhash" -> (GraftQueries.q21Simhash _),
    "q22_ngram_jaccard" -> (GraftQueries.q22NgramJaccard _),
    "q23_embed_neardup" -> (GraftQueries.q23EmbedNearDup _),
    "q24_ann_cosine" -> (GraftQueries.q24AnnCosine _),
    "q25_ivf_ann" -> (GraftQueries.q25IvfAnn _),
    "q26_lang_quality" -> (GraftQueries.q26LangId _),
    "q27_tokens" -> (GraftQueries.q27Tokens _),
    "q28_multimodal_decode" -> (GraftQueries.q28Multimodal _),
    "q29_stream_hourly" -> (GraftQueries.q29StreamHourly _),
    "q30_cell_encoders" -> (GraftQueries.q30CellEncoders _),
    "q31_raster_store" -> (GraftQueries.q31RasterStore _),
    "q32_sessionize" -> (GraftQueries.q32Sessionize _),
    "q33_salted_agg" -> (GraftQueries.q33SaltedAgg _),
    "q34_downcast" -> (GraftQueries.q34Downcast _),
    "q35_vectorize" -> (GraftQueries.q35Vectorize _),
    "q36_radius_join" -> (GraftQueries.q36RadiusJoin _),
    "q37_asof_join" -> (GraftQueries.q37AsOfJoin _),
    "q38_highcard_codes" -> (GraftQueries.q38HighCardCodes _),
    "q39_neardup_skew" -> (GraftQueries.q39NearDupSkew _),
    "q40_xlsx_roundtrip" -> (GraftQueries.q40XlsxRoundtrip _),
    "q41_stream_dedup" -> (GraftQueries.q41StreamDedup _),
    "q42_resample" -> (GraftQueries.q42Resample _),
    "q43_text_identity" -> (GraftQueries.q43TextIdentity _),
    "q44_spherical_radius" -> (GraftQueries.q44SphericalRadius _),
    "q45_incremental" -> (GraftQueries.q45Incremental _),
    "q46_metadata" -> (GraftQueries.q46Metadata _),
    "q47_spherical_knn" -> (GraftQueries.q47SphericalKnn _),
    "q48_line_dedup" -> (GraftQueries.q48LineDedup _),
    "q49_repetition" -> (GraftQueries.q49Repetition _),
    "q50_url_canon" -> (GraftQueries.q50UrlCanon _),
    "q51_pii_scrub" -> (GraftQueries.q51PiiScrub _),
    "q52_bloom_incremental" -> (GraftQueries.q52BloomIncremental _),
    "q53_tfidf" -> (GraftQueries.q53Tfidf _),
    "q54_pq_ann" -> (GraftQueries.q54PqAnn _),
    "q55_components" -> (GraftQueries.q55Components _),
    "q56_sample_split" -> (GraftQueries.q56SampleSplit _),
    "q57_packing" -> (GraftQueries.q57Packing _),
    "q58_stream_clean" -> (GraftQueries.q58StreamClean _),
    "q59_contamination" -> (GraftQueries.q59Contamination _),
    "q60_bmp_decode" -> (GraftQueries.q60BmpDecode _),
    "q61_lineage" -> (GraftQueries.q61Lineage _),
    "q62_wav_decode" -> (GraftQueries.q62WavDecode _),
    "q63_y4m_decode" -> (GraftQueries.q63Y4mDecode _),
    "q64_png_decode" -> (GraftQueries.q64PngDecode _),
    "q65_resume" -> (GraftQueries.q65Resume _),
    "q66_jpeg_decode" -> (GraftQueries.q66JpegDecode _),
    "q67_xls_roundtrip" -> (GraftQueries.q67XlsRoundtrip _),
    "q68_gpkg_roundtrip" -> (GraftQueries.q68GpkgRoundtrip _),
    "q69_shp_roundtrip" -> (GraftQueries.q69ShpRoundtrip _),
    "q70_geojson_roundtrip" -> (GraftQueries.q70GeoJsonRoundtrip _),
    "q71_tiff_raster" -> (GraftQueries.q71TiffRaster _),
    "q72_vector_files" -> (GraftQueries.q72VectorFiles _),
    "q73_zarr_export" -> (GraftQueries.q73ZarrExport _)
  )

  /** DuckDB-runnable oracle per query (same column names as the Spark
    * result — the driver sorts columns by name before hashing).
    */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> GraftQueries.q1Sql,
    "q2_join_broadcast" -> GraftQueries.q2Sql,
    "q3_filter_pushdown" -> GraftQueries.q3Sql,
    "q4_window_topk" -> GraftQueries.q4Sql,
    "q5_sort_limit" -> GraftQueries.q5Sql,
    "q6_categorize" -> GraftQueries.q6Sql,
    "q7_lookup_join" -> GraftQueries.q7Sql,
    "q8_dedup_exact" -> GraftQueries.q8Sql,
    "q9_hourly_agg" -> GraftQueries.q9Sql,
    "q10_text_quality" -> GraftQueries.q10Sql,
    "q11_fingerprint" -> GraftQueries.q11Sql,
    "q12_bng_cell" -> GraftQueries.q12Sql,
    "q13_tile_counts" -> GraftQueries.q13Sql,
    "q14_spatial_join" -> GraftQueries.q14Sql,
    "q15_knn" -> GraftQueries.q15Sql,
    "q16_raster_burn" -> GraftQueries.q16Sql,
    "q17_ann_topk" -> GraftQueries.q17Sql,
    "q18_semi_anti_join" -> GraftQueries.q18Sql,
    "q19_set_ops" -> GraftQueries.q19Sql,
    "q25_ivf_ann" -> GraftQueries.q25Sql,
    "q27_tokens" -> GraftQueries.q27Sql,
    "q28_multimodal_decode" -> GraftQueries.q28Sql,
    "q29_stream_hourly" -> GraftQueries.q29Sql,
    "q31_raster_store" -> GraftQueries.q31Sql,
    "q32_sessionize" -> GraftQueries.q32Sql,
    "q33_salted_agg" -> GraftQueries.q33Sql,
    "q34_downcast" -> GraftQueries.q34Sql,
    "q35_vectorize" -> GraftQueries.q35Sql,
    "q36_radius_join" -> GraftQueries.q36Sql,
    "q37_asof_join" -> GraftQueries.q37Sql,
    "q21_simhash" -> GraftQueries.q21Sql,
    "q22_ngram_jaccard" -> GraftQueries.q22Sql,
    "q38_highcard_codes" -> GraftQueries.q38Sql,
    "q39_neardup_skew" -> GraftQueries.q39Sql,
    "q40_xlsx_roundtrip" -> GraftQueries.q40Sql,
    "q41_stream_dedup" -> GraftQueries.q41Sql,
    "q42_resample" -> GraftQueries.q42Sql,
    "q43_text_identity" -> GraftQueries.q43Sql,
    "q44_spherical_radius" -> GraftQueries.q44Sql,
    "q45_incremental" -> GraftQueries.q45Sql,
    "q46_metadata" -> GraftQueries.q46Sql,
    "q47_spherical_knn" -> GraftQueries.q47Sql,
    "q48_line_dedup" -> GraftQueries.q48Sql,
    "q49_repetition" -> GraftQueries.q49Sql,
    "q50_url_canon" -> GraftQueries.q50Sql,
    "q51_pii_scrub" -> GraftQueries.q51Sql,
    "q52_bloom_incremental" -> GraftQueries.q52Sql,
    "q53_tfidf" -> GraftQueries.q53Sql,
    "q54_pq_ann" -> GraftQueries.q54Sql,
    "q55_components" -> GraftQueries.q55Sql,
    "q56_sample_split" -> GraftQueries.q56Sql,
    "q57_packing" -> GraftQueries.q57Sql,
    "q58_stream_clean" -> GraftQueries.q58Sql,
    "q59_contamination" -> GraftQueries.q59Sql,
    "q60_bmp_decode" -> GraftQueries.q60Sql,
    "q61_lineage" -> GraftQueries.q61Sql,
    "q62_wav_decode" -> GraftQueries.q62Sql,
    "q63_y4m_decode" -> GraftQueries.q63Sql,
    "q64_png_decode" -> GraftQueries.q64Sql,
    "q65_resume" -> GraftQueries.q65Sql,
    "q66_jpeg_decode" -> GraftQueries.q66Sql,
    "q20_minhash_lsh" -> GraftQueries.q20Sql,
    "q23_embed_neardup" -> GraftQueries.q23Sql,
    "q67_xls_roundtrip" -> GraftQueries.q67Sql,
    "q68_gpkg_roundtrip" -> GraftQueries.q68Sql,
    "q69_shp_roundtrip" -> GraftQueries.q69Sql,
    "q70_geojson_roundtrip" -> GraftQueries.q70Sql,
    "q71_tiff_raster" -> GraftQueries.q71Sql,
    "q72_vector_files" -> GraftQueries.q72Sql,
    "q73_zarr_export" -> GraftQueries.q73Sql,
    "q24_ann_cosine" -> GraftQueries.q24Sql,
    "q26_lang_quality" -> GraftQueries.q26Sql
    // q30 is the ONLY remaining rows-only query: the H3/S2 cell encoders
    // chain an inverse transverse-Mercator projection, a Helmert datum
    // shift, and icosahedral-hex / Hilbert-cube indexing — not
    // SQL-expressible; exactness is pinned by H3S2Spec (known-value and
    // property tests) and the BNG leg is oracle-exact via q12/q13.
    // Everything else is oracle-checked: q21 md5-simhash banding is
    // pigeonhole-exact; q22 shingle-Jaccard is recomputed relationally;
    // q54/q25 via integer-Lloyd trainers (round 4); q20/q23 via md5
    // integer twins (round 5); q24 float cosine is bit-reproducible
    // because both engines sum sequentially in double (round 5); q26's
    // three text kernels are replicated relationally, incl. the FNV-1a
    // fold as a recursive CTE in HUGEINT mod-2^64 arithmetic (round 5).
  )
}
