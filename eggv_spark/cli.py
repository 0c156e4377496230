"""Command-line shell: ``eggv-spark {retrieve,process,annotate,complete}``.

Mirrors the reference's click CLI (``eggv/cli.py:113-196``): four
subcommands sharing a common option set, options merged over a YAML
config file over built-in defaults (precedence semantics of
``eggv/cli.py:20-40`` + ``eggv/configuration.py:72-83``), validation
up front (``eggv/cli.py:43-77``).  The reference's cluster-mode trio
(--local/--hpc/--custom + scheduler address) collapses into one
``--master`` string because Spark's master URL already encodes the
deployment mode (local[N] / yarn / k8s:// / spark://host:port).
"""

from __future__ import annotations

import sys
from typing import Any

import click

from eggv_spark import pipeline
from eggv_spark.config import load_config, validate_config


def _common_options(fn):
    fn = click.option("-c", "--config", "config_path", type=click.Path(exists=True), default=None, help="YAML config file")(fn)
    fn = click.option("-s", "--species", type=click.Choice(["hg38", "mm10"]), default=None, help="species build to run")(fn)
    fn = click.option("-m", "--master", default=None, help="Spark master URL (local[N], yarn, spark://...)")(fn)
    fn = click.option("-d", "--data-dir", default=None, help="root data directory")(fn)
    fn = click.option("-f", "--force/--no-force", default=None, help="re-retrieve and overwrite existing outputs")(fn)
    fn = click.option("--shuffle-partitions", type=int, default=None, help="spark.sql.shuffle.partitions upper bound")(fn)
    return fn


def _build_config(config_path: str | None, species: str | None, master: str | None,
                  data_dir: str | None, force: bool | None,
                  shuffle_partitions: int | None) -> dict[str, Any]:
    overrides: dict[str, Any] = {}
    if species is not None:
        overrides["species"] = species
    if force is not None:
        overrides["overwrite"] = force
    if data_dir is not None:
        overrides["directories"] = {"data": data_dir}
    spark_over: dict[str, Any] = {}
    if master is not None:
        spark_over["master"] = master
    if shuffle_partitions is not None:
        spark_over["shuffle_partitions"] = shuffle_partitions
    if spark_over:
        overrides["spark"] = spark_over
    config = load_config(config_path, overrides)
    try:
        validate_config(config)
    except ValueError as exc:
        click.echo(f"error: {exc}", err=True)
        sys.exit(2)
    return config


@click.group()
def cli() -> None:
    """eggv-spark: PySpark-native variant/gene ETL + analytics engine."""


@cli.command()
@_common_options
def retrieve(**kw) -> None:
    """Download the Ensembl variant (GVF) and gene (GTF) builds."""
    pipeline.run_retrieve_step(_build_config(**kw))


@cli.command()
@_common_options
def process(**kw) -> None:
    """Parse raw builds into effects/metadata/gene tables."""
    pipeline.run_process_step(_build_config(**kw))


@cli.command()
@_common_options
def annotate(**kw) -> None:
    """Join variant effects to genes; split intergenic/intragenic."""
    pipeline.run_annotate_step(_build_config(**kw))


@cli.command()
@_common_options
def complete(**kw) -> None:
    """Full pipeline: retrieve -> process -> annotate."""
    pipeline.run_complete_pipeline(_build_config(**kw))


if __name__ == "__main__":
    cli()
