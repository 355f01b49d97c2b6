"""File writers (reference L6: ``base_loaders.py:281-315``,
``common_utils.py:141-171``): JSON / JSONL / CSV / Parquet, append or
overwrite, optional ``partitionBy`` (the "automated data partitioning"
the reference claims but never implements — ``README.md:293``)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def _write_yaml(df: DataFrame, path: str, mode: str) -> None:
    """YAML writer parity (reference ``common_utils.py:141-171``).
    YAML has no distributed/splittable form — like the reference this
    is a driver-side dump of a SMALL result (reports, configs, query
    outputs), never a bulk-data path. Full YAML via PyYAML when
    installed; without it the flat-subset codec (``sources/yamlite``)
    emits scalar mappings (bare numbers/bools/null, JSON-quoted
    strings — valid YAML any parser reads) and rejects nested values
    loudly."""
    import os

    rows = [r.asDict(recursive=True) for r in df.collect()]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        import yaml
    except ImportError:
        from ..sources import yamlite

        with open(path, "a" if mode == "append" else "w") as fh:
            fh.write(yamlite.dump_rows(rows))
        return
    with open(path, "a" if mode == "append" else "w") as fh:
        yaml.safe_dump(rows, fh, sort_keys=False, default_flow_style=False)


def write_file(
    df: DataFrame,
    path: str,
    file_format: str = "parquet",
    mode: str = "append",
    partition_by: Sequence[str] | None = None,
    coalesce: int | None = None,
    **options,
) -> None:
    """L6 writer. ``coalesce`` bounds output file count for small
    results (driver-friendly); leave None at scale so every task
    writes its own file."""
    if file_format == "yaml":
        _write_yaml(df, path, mode)
        return
    out = df.coalesce(coalesce) if coalesce else df
    writer = out.write.mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    fmt = {"json": "json", "jsonl": "json", "csv": "csv", "parquet": "parquet"}.get(
        file_format
    )
    if fmt is None:
        raise ValueError(f"unsupported file format: {file_format!r}")
    if fmt == "csv":
        writer = writer.option("header", True)
    writer.format(fmt).save(path)
