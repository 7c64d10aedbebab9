"""Tar interchange between Starchart instances (S9/S10/S11).

The reference publishes its crawled YAML tree as ``{epoch}.tar`` with
retention 5 (/root/reference/federate/publiccodeyml/src/lib.rs:221-265,
``latest_tar`` :268-304) and imports a foreign instance's latest tar by
untarring, walking the directory tree and inserting every entity if absent
with ``import=true`` lineage (:307-423). Tree layout (docs/published-crwaled-
data.md:8-17):

    <root>/<hostname>/instance.yml
    <root>/<hostname>/<username>/user.yml
    <root>/<hostname>/<username>/<repo>/publiccode.yml

Spark-first split of responsibilities:

- **rendering and parsing are distributed** — entity rows → (path, yaml)
  rows via vectorized Arrow batches; import reads every YAML file with
  ``spark.read.option("wholetext")`` + ``input_file_name()`` and parses in
  ``mapInPandas``. No driver-side per-row loops.
- **the tar itself is driver-side** — it is the *interchange boundary*
  (the reference's HTTP download of one tar file), not a data-plane
  operation; at scale the tree lives on a shared filesystem / object store
  and the tarball stays a single small artifact per publish epoch.
"""

from __future__ import annotations

import os
import tarfile
from collections.abc import Iterator

import pandas as pd
import yaml
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from starchart_spark import tables
from starchart_spark.crawl.federate import repo_to_publiccode_dict

FILE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),  # relative to tree root
        T.StructField("content", T.StringType(), False),
    ]
)

def _host_dir():
    """Directory name for a canonical forge URL: scheme and slashes stripped
    (the reference's get_hostname, federate/federate-core/src/lib.rs:100-102)."""
    return F.regexp_replace(F.col("hostname"), r"^[a-z0-9+.\-]+://|/+$", "")


def _pyval(v):
    """Arrow/pandas → plain-Python for YAML: numpy scalars unboxed, NaN →
    None (so YAML writes ``null``, never ``.nan``), integral floats (a
    nullable int column that passed through float64) → int, arrays → lists.
    Recurses through the nested publiccode dicts."""
    import numpy as np

    if v is None:
        return None
    if isinstance(v, np.ndarray):
        return [_pyval(x) for x in v.tolist()]
    if isinstance(v, dict):
        return {k: _pyval(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_pyval(x) for x in v]
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float):
        if pd.isna(v):
            return None
        if v.is_integer():
            return int(v)
    return v


def _yaml_files(df: DataFrame, cols: list[str], path_col, to_dict) -> DataFrame:
    """(path, yaml-rendered content) rows, rendered per Arrow batch."""

    def _render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    "path": pdf["__path"],
                    "content": [
                        yaml.safe_dump(_pyval(to_dict(r)), sort_keys=True)
                        for r in pdf.to_dict("records")
                    ],
                }
            )

    return df.select(*cols, path_col.alias("__path")).mapInPandas(_render, FILE_SCHEMA)


def render_tree(forges: DataFrame, users: DataFrame, repos: DataFrame) -> DataFrame:
    """All three entity planes as one (path, content) DataFrame (S8 layout)."""
    f_files = _yaml_files(
        forges,
        ["hostname", "forge_type", "verified_on", "last_crawl_on"],
        F.concat(_host_dir(), F.lit("/instance.yml")),
        lambda r: {
            "hostname": r["hostname"],
            "forgeType": r["forge_type"],
            "verifiedOn": r["verified_on"],
            "lastCrawlOn": r["last_crawl_on"],
        },
    )
    u_files = _yaml_files(
        users,
        ["hostname", "username", "html_link", "profile_photo"],
        F.concat(_host_dir(), F.lit("/"), F.col("username"), F.lit("/user.yml")),
        lambda r: {
            "username": r["username"],
            "htmlUrl": r["html_link"],
            "profilePhoto": r["profile_photo"],
        },
    )
    r_files = _yaml_files(
        repos,
        ["hostname", "owner", "name", "description", "website", "html_url", "tags"],
        F.concat(
            _host_dir(), F.lit("/"), F.col("owner"), F.lit("/"), F.col("name"),
            F.lit("/publiccode.yml"),
        ),
        repo_to_publiccode_dict,
    )
    return f_files.unionByName(u_files).unionByName(r_files)


def write_tree(files: DataFrame, root: str) -> None:
    """Write the YAML tree under ``root``. Each partition writes its own
    files (a shared filesystem / object store at cluster scale) — no driver
    row loop."""
    root = os.path.abspath(root)

    def _write(rows) -> None:
        for row in rows:
            dest = os.path.join(root, row["path"])
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            with open(dest, "w") as fh:
                fh.write(row["content"])

    files.foreachPartition(_write)


def export_tree(
    forges: DataFrame, users: DataFrame, repos: DataFrame, root: str
) -> None:
    write_tree(render_tree(forges, users, repos), root)


def publish_tar(root: str, out_dir: str, epoch: int, keep: int = 5) -> str:
    """S9: tar the tree as ``{epoch}.tar``; keep only the newest ``keep``
    tarballs (lib.rs:239-262). ``epoch`` is injected batch time — never wall
    clock (N8 determinism)."""
    os.makedirs(out_dir, exist_ok=True)
    dest = os.path.join(out_dir, f"{epoch}.tar")
    tmp = dest + ".tmp"
    with tarfile.open(tmp, "w") as tf:
        tf.add(root, arcname=".")
    os.replace(tmp, dest)
    tars = sorted(
        (f for f in os.listdir(out_dir) if f.endswith(".tar")),
        key=lambda f: int(f[:-4]),
    )
    for old in tars[:-keep] if keep else tars:
        os.remove(os.path.join(out_dir, old))
    return dest


def latest_tar(out_dir: str) -> str | None:
    """S10 (lib.rs:268-304): newest published tarball, by epoch."""
    try:
        tars = [f for f in os.listdir(out_dir) if f.endswith(".tar")]
    except FileNotFoundError:
        return None
    if not tars:
        return None
    return os.path.join(out_dir, max(tars, key=lambda f: int(f[:-4])))


def _read_yaml_files(spark: SparkSession, root: str, name: str) -> DataFrame:
    """(content, tree-relative path) for every ``name`` file under root,
    read distributed (wholetext + input_file_name)."""
    import re as _re

    df = (
        spark.read.option("recursiveFileLookup", "true")
        .option("pathGlobFilter", name)
        # NB: wholetext must be the reader kwarg — the string option form is
        # silently ignored by the text source and yields line-per-row
        .text(os.path.abspath(root), wholetext=True)
        .withColumn("__file", F.input_file_name())
    )
    # input_file_name yields a URI (file:///...); normalize then strip root
    norm = F.regexp_replace(F.col("__file"), r"^file:/+", "/")
    rel = F.regexp_replace(
        norm, "^" + _re.escape(os.path.abspath(root).rstrip("/")) + "/", ""
    )
    return df.select(F.col("value").alias("content"), rel.alias("relpath"))


def _parse_yaml_batches(df: DataFrame, out_schema: T.StructType, row_fn) -> DataFrame:
    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = [
                row_fn(yaml.safe_load(c), p)
                for c, p in zip(pdf["content"], pdf["relpath"])
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(_parse, out_schema)


def read_tree(spark: SparkSession, root: str) -> dict[str, DataFrame]:
    """Parse an exported/untarred tree back into canonical entity rows with
    ``imported=true`` lineage (S11 / N6 / D9)."""

    def _host_url(relpath: str) -> str:
        return "https://" + relpath.split("/", 1)[0] + "/"

    forges = _parse_yaml_batches(
        _read_yaml_files(spark, root, "instance.yml"),
        tables.FORGES,
        lambda d, p: {
            "hostname": d["hostname"],
            "forge_type": d["forgeType"],
            "verified_on": d.get("verifiedOn"),
            "last_crawl_on": d.get("lastCrawlOn"),
            "imported": True,
            "starchart_instance": None,
        },
    )
    users = _parse_yaml_batches(
        _read_yaml_files(spark, root, "user.yml"),
        tables.USERS,
        lambda d, p: {
            "hostname": _host_url(p),
            "username": d["username"],
            "html_link": d["htmlUrl"],
            "profile_photo": d.get("profilePhoto"),
            "imported": True,
        },
    )

    def _repo_row(d: dict, p: str) -> dict:
        desc = (d.get("description") or {}).get("en") or {}
        return {
            "hostname": _host_url(p),
            "owner": (d.get("legal") or {}).get("repoOwner"),
            "name": d["name"],
            "description": desc.get("shortDescription"),
            "website": d.get("landingURL"),
            "html_url": d["url"],
            "tags": (d.get("intendedAudience") or {}).get("scope"),
            "imported": True,
        }

    repos = _parse_yaml_batches(
        _read_yaml_files(spark, root, "publiccode.yml"), tables.REPOSITORIES, _repo_row
    )
    return {"forges": forges, "users": users, "repositories": repos}


def import_tar(
    spark: SparkSession, tar_path: str, workdir: str
) -> dict[str, DataFrame]:
    """S11: untar a foreign instance's snapshot and parse it (the caller
    MERGEs the result into its own tables — insert-if-absent keeps local
    rows authoritative, lib.rs:347-417)."""
    os.makedirs(workdir, exist_ok=True)
    with tarfile.open(tar_path) as tf:
        try:
            tf.extractall(workdir, filter="data")  # refuses path traversal
        except TypeError:  # pragma: no cover — Python < 3.12
            tf.extractall(workdir)  # noqa: S202 — trusted test artifact
    return read_tree(spark, workdir)


def import_into_engine(engine, dfs: dict[str, DataFrame], batch_id: int = -1) -> dict:
    """MERGE a parsed foreign tree into an engine's tables with
    imported=true rows; idempotent (D9). Returns inserted counts."""
    out = {}
    for name, tbl in (
        ("forges", engine.forges),
        ("users", engine.users),
        ("repositories", engine.repositories),
    ):
        # one observed-write action per table; the inserted count rides the
        # snapshot summary, never a separate count() job
        snap, _ins = tbl.merge_insert(
            engine.spark, dfs[name], {"op": "import-tar", "batch_id": batch_id}
        )
        out[name] = int(snap.summary.get("inserted", 0))
    # imported entities carry no url_seen keys, so the engine's per-batch
    # entity confirm anti-join is required again until a later run()
    # re-verifies the entity⊆url_seen invariant
    engine._entities_pure = False
    return out
