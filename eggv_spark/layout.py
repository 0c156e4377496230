"""Data-directory layout registry.

The reference pins a fixed directory tree + filename scheme under one
root (``eggv/globe.py:55-111``: variants/{build}/{raw,effects,meta},
genes/{build}/{raw,meta}, annotated/{intergenic,intragenic}) and
every pipeline stage reads/writes through it.  Same contract here,
as a plain dataclass instead of a singleton — and each "file" is a
*directory* of partitioned output (Spark's native sink shape), with
single-file TSV export left to ``sources.writers.write_tsv``.

Ensembl v95 source URLs and chromosome lists match the reference's
registry (``eggv/globe.py:40-53``) — they are public Ensembl paths.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

#: Public Ensembl release-95 build URLs (reference eggv/globe.py:40-49).
ENSEMBL_URLS = {
    "hg38_variation": (
        "http://ftp.ensembl.org/pub/release-95/variation/gvf/homo_sapiens/"
        "homo_sapiens_incl_consequences-chr{}.gvf.gz"
    ),
    "mm10_variation": (
        "http://ftp.ensembl.org/pub/release-95/variation/gvf/mus_musculus/"
        "mus_musculus_incl_consequences.gvf.gz"
    ),
    "hg38_gene": (
        "http://ftp.ensembl.org/pub/release-95/gtf/homo_sapiens/"
        "Homo_sapiens.GRCh38.95.gtf.gz"
    ),
    "mm10_gene": (
        "http://ftp.ensembl.org/pub/release-95/gtf/mus_musculus/"
        "Mus_musculus.GRCm38.95.gtf.gz"
    ),
}

#: Per-species chromosome fan-out (reference eggv/globe.py:52-53).
CHROMOSOMES = {
    "hg38": [str(c) for c in range(1, 23)] + ["X", "Y"],
    "mm10": [str(c) for c in range(1, 20)] + ["X", "Y"],
}


@dataclass
class DataLayout:
    """Path registry for one (data root, species build) pair."""

    base_dir: str
    build: str
    dirs: dict[str, str] = field(default_factory=dict, repr=False)

    def __post_init__(self) -> None:
        b, root = self.build, self.base_dir
        self.dir_variant_raw = os.path.join(root, "variants", b, "raw")
        self.dir_variant_effects = os.path.join(root, "variants", b, "effects")
        self.dir_variant_meta = os.path.join(root, "variants", b, "meta")
        self.dir_gene_raw = os.path.join(root, "genes", b, "raw")
        self.dir_gene_meta = os.path.join(root, "genes", b, "meta")
        self.dir_annotated_inter = os.path.join(root, "variants", b, "annotated", "intergenic")
        self.dir_annotated_intra = os.path.join(root, "variants", b, "annotated", "intragenic")
        self.dirs = {
            name: getattr(self, name)
            for name in dir(self)
            if name.startswith("dir_") and name != "dirs"
        }

    def create(self) -> None:
        for path in self.dirs.values():
            os.makedirs(path, exist_ok=True)

    # ---- raw inputs (driver-side files) -------------------------------
    def variant_gvf(self, chromosome: str | None = None) -> str:
        """Raw GVF path; per-chromosome for hg38, single file for mm10
        (reference fp_variant_raw / per-chrom scheme)."""
        name = (
            f"{self.build}-chromosome-{chromosome}.gvf.gz"
            if chromosome is not None
            else f"{self.build}-variant-build.gvf.gz"
        )
        return os.path.join(self.dir_variant_raw, name)

    def variant_gvf_glob(self) -> str:
        """Glob matching every raw GVF — one DataFrame over all
        chromosomes, letting Spark parallelize across files."""
        return os.path.join(self.dir_variant_raw, "*.gvf.gz")

    def gene_gtf(self) -> str:
        return os.path.join(self.dir_gene_raw, f"{self.build}-gene-build.gtf.gz")

    # ---- processed outputs (partitioned directories) ------------------
    def variant_effects(self) -> str:
        return os.path.join(self.dir_variant_effects, f"{self.build}-variant-effects")

    def variant_meta(self) -> str:
        return os.path.join(self.dir_variant_meta, f"{self.build}-variant-metadata")

    def gene_meta(self) -> str:
        return os.path.join(self.dir_gene_meta, f"{self.build}-gene-build")

    def gene_dedup(self) -> str:
        return os.path.join(self.dir_gene_meta, f"{self.build}-gene-build-dedup")

    def annotated_intergenic(self) -> str:
        return os.path.join(self.dir_annotated_inter, f"{self.build}-intergenic-variants")

    def annotated_intragenic(self) -> str:
        return os.path.join(self.dir_annotated_intra, f"{self.build}-intragenic-variants")
