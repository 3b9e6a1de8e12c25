"""Pipeline configuration.

Defaults mirror the reference's published configuration
(reference ``config.yml`` / ``config.optimized.yml``; thresholds at
``config.yml:96-99,160-162``; classifier hyper-params at
``config.yml:143-155``) but are plain dataclass fields here — the new
engine is config-driven the same way, just without YAML ceremony.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# The five embedded record fields, in canonical order
# (reference config.yml:37).
EMBED_FIELDS: tuple[str, ...] = (
    "composite",
    "person",
    "title",
    "provision",
    "subjects",
)

# The 14-feature contract, in reference order
# (reference output/summary_report.json:34-50).
FEATURE_NAMES: tuple[str, ...] = (
    "composite_cosine",
    "person_cosine",
    "title_cosine",
    "provision_cosine",
    "subjects_cosine",
    "person_levenshtein",
    "person_title_harmonic",
    "person_provision_harmonic",
    "person_subjects_harmonic",
    "title_subjects_harmonic",
    "title_provision_harmonic",
    "provision_subjects_harmonic",
    "person_subjects_product",
    "composite_subjects_ratio",
)

# Golden model parameters published by the reference
# (reference output/detailed/model_parameters.json). Used by tests and
# as the default scoring weights when no model has been trained.
GOLDEN_WEIGHTS: dict[str, float] = {
    "composite_cosine": 0.20288099328543954,
    "person_cosine": 0.6100086739673565,
    "title_cosine": 0.029226683922015155,
    "provision_cosine": 0.0007583579956876954,
    "subjects_cosine": 0.1519413216913845,
    "person_levenshtein": 0.4928317100978894,
    "person_title_harmonic": 0.19652928908904116,
    "person_provision_harmonic": 0.24140908356501148,
    "person_subjects_harmonic": 0.27574385618078473,
    "title_subjects_harmonic": 0.12387059427881868,
    "title_provision_harmonic": 0.05479368156514985,
    "provision_subjects_harmonic": 0.10596624810758645,
    "person_subjects_product": 0.39459327207464673,
    "composite_subjects_ratio": -0.008143578664694853,
}
GOLDEN_BIAS: float = -0.7791475382513592
GOLDEN_THRESHOLD: float = 0.75


@dataclass
class PipelineConfig:
    """Knobs for the end-to-end ER pipeline."""

    seed: int = 42  # reference config.yml:9

    # preprocessing
    embedding_dim: int = 64  # 1536 in the reference; dim is config (config.yml:46)
    min_string_frequency: int = 1  # reference config.yml:70 (P4)

    # blocking
    minhash_num_hashes: int = 24
    # 4 bands × 6 rows: measured on the 20k fixture, 8 bands (3 rows)
    # yields 1.91M candidate pairs vs 0.60M at 4 bands with IDENTICAL
    # end-to-end pairwise F1 at every corpus size tested — the looser
    # bands only admitted junk the classifier rejected anyway. The
    # initials/token-sort/exact/SN families carry the structured-variant
    # recall; minhash covers residual fuzzy similarity.
    minhash_bands: int = 4  # rows per band = num_hashes // bands
    shingle_size: int = 3
    sorted_neighborhood_window: int = 3
    max_block_size: int = 2000  # reference max candidates per query (config.yml:97)

    # scoring / classification
    match_threshold: float = 0.75  # reference config.optimized.yml:179
    # C4/C6 prefilters (reference src/classification.py:543-619) default
    # OFF: the reference's 0.65/0.70 cosine thresholds are calibrated
    # for its OpenAI text-embedding space, not the bundled deterministic
    # char-trigram embedder — with trigram vectors they cost ~0.7pt of
    # recall on the fixture. Use PipelineConfig.reference_parity() to
    # run with the reference's published thresholds.
    composite_cosine_autoaccept: float | None = None  # C4; None = disabled
    autoaccept_confidence: float = 0.90
    year_match_confidence: float = 0.95  # C5
    year_accept_min_person_sim: float = 0.5  # name floor gating C5
    person_cosine_autoreject: float | None = None  # C6; None = disabled
    autoreject_confidence: float = 0.25
    # corroboration rule for low-information names (engine addition):
    # initials-form names need a second field to agree before matching
    require_corroboration_low_info: bool = True
    corroboration_title_jaccard: float = 0.3
    corroboration_subjects_jaccard: float = 0.8
    low_info_confidence_cap: float = 0.5

    # training (C1; reference config.yml:143-155)
    learning_rate: float = 0.01
    max_iterations: int = 1000
    l2_lambda: float = 0.01
    early_stop_patience: int = 5

    # clustering (G5; reference config.yml:160-162)
    edge_threshold: float = 0.75
    min_cluster_size: int = 2
    max_cluster_size: int = 100

    # execution
    checkpoint_dir: str = "/tmp/erp_spark_work"
    # write the report file set (summary/match_pairs/cluster stats/
    # model params/feature correlation) under <checkpoint_dir>/reports
    # after the cluster stage (reference src/reporting.py:85-160)
    generate_reports: bool = False

    fields: tuple[str, ...] = field(default_factory=lambda: EMBED_FIELDS)

    def is_default_training_config(self) -> bool:
        """True when the training/thresholding knobs are the shipped
        defaults (reference config.yml values) — recorded in reports so
        a tuned-gate F1 is never silently presented as the
        out-of-the-box number."""
        d = PipelineConfig()
        return (
            self.learning_rate == d.learning_rate
            and self.max_iterations == d.max_iterations
            and self.l2_lambda == d.l2_lambda
            and self.match_threshold == d.match_threshold
            and self.edge_threshold == d.edge_threshold
        )

    @classmethod
    def reference_parity(cls, **overrides) -> "PipelineConfig":
        """The reference's published prefilter thresholds
        (config.yml:96-99: C4 composite>=0.65 autoaccept, C6
        person<0.70 autoreject) — correct when pairing the engine with
        OpenAI-grade embeddings as the reference does."""
        base = dict(
            composite_cosine_autoaccept=0.65,
            person_cosine_autoreject=0.70,
        )
        base.update(overrides)
        return cls(**base)
