package graft.plans

/**
 * Declarative per-table V2F transform configuration.
 *
 * Data-for-data replication of the reference's table constants
 * (reference: v2f/src/main/scala/.../V2FConstants.scala:6-287). The config
 * is WHAT each pipeline computes; execution is Spark-native (see V2F).
 */
final case class V2FTableConfig(
  tableName: String,
  filePath: String,
  fieldsToConvertToDouble: Set[String] = Set.empty,
  fieldsToConvertToLong: Set[String] = Set.empty,
  fieldsToConvertToBoolean: Set[String] = Set.empty,
  /** delimiter -> fields split to array<string> */
  fieldsToConvertToStringArray: Map[String, Set[String]] = Map.empty,
  /** delimiter -> fields split to array<double> ("." whitelisted to NULL) */
  fieldsToConvertToDoubleArray: Map[String, Set[String]] = Map.empty,
  fieldsToRename: Map[String, String] = Map.empty,
  fieldsToRemove: Set[String] = Set.empty,
  variantFieldsToExtract: Set[String] =
    Set("id", "chromosome", "position", "reference", "alt"),
  variantFieldsToRename: Map[String, String] = Map("var_id" -> "id")
)

object V2FTables {

  /** reference: V2FConstants.scala:71-89 */
  val FrequencyAnalysis: V2FTableConfig = V2FTableConfig(
    tableName = "Frequency Analysis",
    filePath = "frequency-analysis",
    fieldsToConvertToDouble = Set("eaf", "maf"),
    fieldsToConvertToLong = Set("position"),
    fieldsToRename = Map("var_id" -> "variant_id"),
    fieldsToRemove = Set("chromosome", "position", "reference", "alt")
  )

  /** reference: V2FConstants.scala:91-111 */
  val MetaAnalysisAncestrySpecific: V2FTableConfig = V2FTableConfig(
    tableName = "Ancestry-Specific Meta-Analysis",
    filePath = "meta-analysis/ancestry-specific",
    fieldsToConvertToDouble = Set("p_value", "beta", "std_err"),
    fieldsToConvertToLong = Set("n", "position"),
    fieldsToRename = Map("var_id" -> "variant_id"),
    fieldsToRemove = Set("chromosome", "position", "reference", "alt")
  )

  /** reference: V2FConstants.scala:113-136 */
  val MetaAnalysisTransEthnic: V2FTableConfig = V2FTableConfig(
    tableName = "Trans-Ethnic Meta-Analysis",
    filePath = "meta-analysis/trans-ethnic",
    fieldsToConvertToDouble = Set("p_value", "z_score", "std_err", "beta"),
    fieldsToConvertToLong = Set("n", "position"),
    fieldsToConvertToBoolean = Set("top"),
    fieldsToRename = Map("var_id" -> "variant_id"),
    fieldsToRemove = Set("chromosome", "position", "reference", "alt")
  )

  /** reference: V2FConstants.scala:138-152 */
  val VariantEffectRegulatoryFeatureConsequences: V2FTableConfig = V2FTableConfig(
    tableName = "Regulatory Feature Consequences",
    filePath = "variant-effect/regulatory-feature-consequences",
    fieldsToConvertToBoolean = Set("pick"),
    fieldsToConvertToStringArray = Map("," -> Set("consequence_terms")),
    fieldsToRename = Map("id" -> "variant_id")
  )

  /** reference: V2FConstants.scala:154-272 */
  val VariantEffectTranscriptConsequences: V2FTableConfig = V2FTableConfig(
    tableName = "Transcript Consequences",
    filePath = "variant-effect/transcript-consequences",
    fieldsToConvertToDouble = Set(
      "cadd_phred", "cadd_raw", "cadd_raw_rankscore", "dann_rankscore",
      "dann_score", "eigen_pc_raw", "eigen_pc_raw_rankscore", "eigen_phred",
      "eigen_raw", "fathmm_converted_rankscore", "fathmm_mkl_coding_rankscore",
      "fathmm_mkl_coding_score", "genocanyon_score", "genocanyon_score_rankscore",
      "gerp_plus_plus_nr", "gerp_plus_plus_rs", "gerp_plus_plus_rs_rankscore",
      "gm_12878_confidence_value", "gm_12878_fitcons_score",
      "gm_12878_fitcons_score_rankscore", "h_1_hesc_confidence_value",
      "h_1_hesc_fitcons_score", "h_1_hesc_fitcons_score_rankscore",
      "huvec_confidence_value", "huvec_fitcons_score",
      "huvec_fitcons_score_rankscore", "integrated_confidence_value",
      "integrated_fitcons_score", "integrated_fitcons_score_rankscore",
      "lrt_converted_rankscore", "lrt_omega", "lrt_score", "metalr_rankscore",
      "metalr_score", "metasvm_rankscore", "metasvm_score",
      "mutationassessor_score", "mutationassessor_score_rankscore",
      "mutationtaster_converted_rankscore", "phastcons_100_way_vertebrate",
      "phastcons_100_way_vertebrate_rankscore", "phastcons_20_way_mammalian",
      "phastcons_20_way_mammalian_rankscore", "phylop_100_way_vertebrate",
      "phylop_100_way_vertebrate_rankscore", "phylop_20_way_mammalian",
      "phylop_20_way_mammalian_rankscore", "polyphen_2_hdiv_rankscore",
      "polyphen_2_hvar_rankscore", "polyphen_score",
      "provean_converted_rankscore", "sift_converted_rankscore",
      "siphy_29_way_logodds", "siphy_29_way_logodds_rankscore", "vest_3_rankscore"
    ),
    fieldsToConvertToLong = Set(
      "cdna_end", "cdna_start", "cds_end", "cds_start", "distance",
      "protein_end", "protein_start", "reliability_index", "strand"
    ),
    fieldsToConvertToBoolean = Set("canonical", "pick"),
    fieldsToConvertToStringArray = Map(
      "," -> Set(
        "consequence_terms", "fathmm_pred", "flags", "lof_flags",
        "mutationtaster_aae", "mutationtaster_model", "mutationtaster_pred",
        "provean_pred", "sift_pred", "transcript_id_vest_3",
        "transcript_var_vest_3", "interpro_domain"
      )
    ),
    fieldsToConvertToDoubleArray = Map(
      "," -> Set(
        "mutationtaster_score", "vest_3_score", "polyphen_2_hdiv_score",
        "polyphen_2_hvar_score", "sift_score", "fathmm_score", "provean_score"
      ),
      ":" -> Set("siphy_29_way_pi")
    ),
    fieldsToRename = Map(
      "gerp++_nr" -> "gerp_plus_plus_nr",
      "gerp++_rs" -> "gerp_plus_plus_rs",
      "gerp++_rs_rankscore" -> "gerp_plus_plus_rs_rankscore",
      "id" -> "variant_id"
    )
  )

  /** reference: V2FConstants.scala:274-287 */
  val DatasetSpecificAnalysis: V2FTableConfig = V2FTableConfig(
    tableName = "Dataset Specific Analysis",
    filePath = "dataset-specific",
    fieldsToRename = Map("var_id" -> "variant_id"),
    fieldsToRemove = Set("chromosome", "position", "reference", "alt")
  )

  val all: List[V2FTableConfig] = List(
    FrequencyAnalysis,
    MetaAnalysisAncestrySpecific,
    MetaAnalysisTransEthnic,
    VariantEffectRegulatoryFeatureConsequences,
    VariantEffectTranscriptConsequences,
    DatasetSpecificAnalysis
  )
}
