"""Deterministic synthesis of the source-code repository table.

Given a planted repo-level dependency plan (an edge list over repo
indices), emit a ``(repo, path, commit, lang, content)`` table whose file
contents encode EXACTLY those dependencies in per-language import syntax
(FIXTURES.md §1). Everything is a pure function of (plan, seed): no
randomness at call time, so ``extract(synthesize(plan)) == plan`` is an
exact test.

Two generation paths:
- :func:`synthesize_source_table` — driver-side, for test-scale tables;
- :func:`synthesize_source_table_distributed` — ``mapInPandas`` over
  ``spark.range`` for bench-scale tables (generation happens on executors,
  one Arrow batch at a time; nothing is collected to the driver).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

LANGS = ("python", "c", "java")

SCHEMA = "repo string, path string, commit string, lang string, content string"

_EXT = {"python": "py", "c": "c", "java": "java"}


def repo_name(i: int, repos_per_org: int = 10) -> str:
    return f"org{i // repos_per_org}/repo{i}"


def _import_line(lang: str, dst_repo: str, mod: int) -> str:
    org, rep = dst_repo.split("/")
    if lang == "python":
        return f"import {org}.{rep}.mod_{mod}"
    if lang == "java":
        return f"import {org}.{rep}.mod_{mod};"
    return f'#include "{org}/{rep}/src/mod_{mod}.h"'


def _filler(lang: str, repo: str, j: int) -> list[str]:
    tag = hashlib.sha1(f"{repo}:{j}".encode()).hexdigest()[:8]
    if lang == "python":
        return [f"def fn_{j}():", f'    return "{tag}"', ""]
    if lang == "java":
        return [f"class C{j} {{", f'  static String tag = "{tag}";', "}", ""]
    return [f"static const char *tag_{j} = \"{tag}\";", ""]


def _file_rows(repo_idx: int, out_deps: list[int], seed: int, repos_per_org: int):
    """Rows for one repo: one file per dependency batch (3 deps/file) plus
    one dependency-free filler file; lang cycles deterministically."""
    repo = repo_name(repo_idx, repos_per_org)
    rows = []
    batches: list[list[int]] = [out_deps[k : k + 3] for k in range(0, len(out_deps), 3)]
    batches.append([])  # filler file with no imports
    for j, batch in enumerate(batches):
        lang = LANGS[(repo_idx + j) % len(LANGS)]
        path = f"src/mod_{j}.{_EXT[lang]}"
        lines = [f"// {repo}/{path}" if lang != "python" else f"# {repo}/{path}"]
        for d in batch:
            lines.append(_import_line(lang, repo_name(d, repos_per_org), j))
        lines += _filler(lang, repo, j)
        content = "\n".join(lines)
        commit = hashlib.sha1(f"{repo}:{path}:{seed}".encode()).hexdigest()
        rows.append((repo, path, commit, lang, content))
    return rows


def synthesize_source_table(
    spark: SparkSession,
    planted_edges: np.ndarray,
    n_repos: int,
    seed: int = 42,
    repos_per_org: int = 10,
) -> DataFrame:
    """Driver-side synthesis (test scale). ``planted_edges`` is an (m, 2)
    int array of repo-index pairs; every repo in [0, n_repos) gets at least
    one (filler) file even with no dependencies."""
    deps: dict[int, list[int]] = {i: [] for i in range(n_repos)}
    for s, d in planted_edges:
        deps[int(s)].append(int(d))
    rows = []
    for i in range(n_repos):
        rows.extend(_file_rows(i, sorted(set(deps[i])), seed, repos_per_org))
    return spark.createDataFrame(rows, SCHEMA)


def synthesize_source_table_distributed(
    spark: SparkSession,
    n_repos: int,
    deps_per_repo: int = 8,
    seed: int = 42,
    repos_per_org: int = 10,
    num_partitions: int | None = None,
) -> DataFrame:
    """Executor-side synthesis for bench-scale tables.

    The dependency plan is itself deterministic: repo i depends on
    ``(i * 2654435761 + k * 40503 + seed) % n_repos`` for k < deps_per_repo
    (a Knuth-hash scatter — hub-free, reproducible on any executor without
    coordination). Generation runs as mapInPandas over spark.range(n_repos):
    one Arrow batch in, one Arrow batch of file rows out.
    """

    def gen(batches):
        for pdf in batches:
            out = []
            for i in pdf["id"].astype(int):
                ds = sorted(
                    {(i * 2654435761 + k * 40503 + seed) % n_repos for k in range(deps_per_repo)}
                    - {i}
                )
                out.extend(_file_rows(i, ds, seed, repos_per_org))
            yield pd.DataFrame(
                out, columns=["repo", "path", "commit", "lang", "content"]
            )

    rng = spark.range(n_repos, numPartitions=num_partitions)
    return rng.mapInPandas(gen, schema=SCHEMA)
