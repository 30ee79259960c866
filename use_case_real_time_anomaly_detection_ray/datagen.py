"""Deterministic seeded generator of the code-repository Parquet corpus.

The Ray-native analog of the reference's data generator
(``data-generator/anomaly-dataset-live.py:45-221`` + ``settings.yaml:1-35``):
instead of a per-sensor random walk posted to an Events API, it writes a
hive-partitioned Parquet corpus ``(repo, path, commit, lang, content, part)``
(FIXTURES.md §1) with planted violations for every check class, each mirrored
from a reference generator knob:

* out-of-range content lengths    <- ``settings.yaml:11`` (pct_out_of_bounds)
* per-repo trend up / trend down  <- ``settings.yaml:23-35`` (sensor presets)
* step change at a known part     <- ``settings.yaml:18-21`` (step size 20-50)
* a repo that stops reporting     <- ``anomaly-dataset-live.py:179-180`` (sensor 5)
* duplicate (repo,path,commit)    <- target uniqueness check (SURVEY.md §2.7 D4)
* dangling repo references        <- target referential check (SURVEY.md §2.4 J3)
* a control repo with nothing planted (false-positive guard, sensor 1 preset)

Every planted violation is recorded exactly in ``expected_violations.json`` for
golden diffs. Generation is pure NumPy, seeded, wall-clock-free.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import asdict, dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = np.array(["py", "js", "go", "rs", "md", "json"])

#: special repo roles (index into the repo list), mirroring settings.yaml
#: sensor presets: 0=monorepo (skew), 1=control, 2=trend-up, 3=trend-down,
#: 4=step, 5=stops-reporting, 6=one-part spike (the z-score/IQR point anomaly —
#: a mid-series level shift alone never yields |z|>2, so the gates need a spike)
MONOREPO, CONTROL, TREND_UP, TREND_DOWN, STEP, STOPPED, SPIKE = 0, 1, 2, 3, 4, 5, 6


@dataclass(frozen=True)
class CorpusSpec:
    seed: int = 42
    n_repos: int = 20
    n_parts: int = 8
    rows_per_part: int = 2000
    min_len: int = 200
    max_len: int = 2000
    base_len_lo: int = 900
    base_len_hi: int = 1300
    jitter_sd: float = 4.0           # keeps clean-repo mean-noise ≈0.5/part,
                                     # so |slope|>3 is a ≈4.5σ event (no false
                                     # drift flags on control repos)
    trend_per_part: float = 10.0     # > ValidationConfig.max_slope (3.0)
    step_size: float = 60.0          # step at part n_parts//2
    spike_size: float = 120.0        # one-part spike at n_parts//2 + 1
    stop_after_part: int | None = None  # default n_parts - 4
    n_out_of_range: int = 24
    n_duplicates: int = 6
    n_dangling: int = 8
    # one part gets a global language-profile shift (the lang-frequency
    # histogram anomaly the z-score/IQR gates must flag, BASELINE.json
    # north_star); fraction of that part's rows forced to `shift_lang`
    lang_shift_frac: float = 0.25
    shift_lang: str = "json"
    # optional planted null-content burst: `null_frac` of rows in part
    # `null_part` get content=NULL (the null/empty-content-rate check's
    # target; defaults keep existing fixtures byte-identical)
    null_part: int | None = None
    null_frac: float = 0.0

    @property
    def lang_shift_part(self) -> int:
        return self.n_parts // 2 + 2

    @property
    def stop_part(self) -> int:
        return self.n_parts - 4 if self.stop_after_part is None else self.stop_after_part


def _repo_names(spec: CorpusSpec) -> list[str]:
    return [f"org{i % 4}/repo{i}" for i in range(spec.n_repos)]


def repo_mean_len(spec: CorpusSpec, repo_idx: int, part: int, base: np.ndarray) -> float:
    """Per-(repo, part) target mean content length — the planted signal."""
    m = float(base[repo_idx])
    if repo_idx == TREND_UP:
        m += spec.trend_per_part * part
    elif repo_idx == TREND_DOWN:
        m -= spec.trend_per_part * part
    elif repo_idx == STEP and part >= spec.n_parts // 2:
        m += spec.step_size
    elif repo_idx == SPIKE and part == spec.n_parts // 2 + 1:
        m += spec.spike_size
    return m


def _make_content(rng: np.random.Generator, lengths: np.ndarray, pool: bytes) -> list[str]:
    """Slice contents out of a shared random ASCII pool — O(total bytes), no
    per-row RNG. Distinct offsets ⇒ distinct contents (dup rows get forced
    distinct offsets)."""
    offs = rng.integers(0, len(pool) - int(lengths.max()) - 1, size=lengths.size)
    return [pool[o:o + int(L)].decode("ascii") for o, L in zip(offs, lengths)]


def generate_corpus(out_dir: str, spec: CorpusSpec = CorpusSpec()) -> dict:
    """Write ``out_dir/part=K/data.parquet`` (+ ``repos.parquet`` manifest,
    ``expected_violations.json``). Returns the expectations dict."""
    os.makedirs(out_dir, exist_ok=True)
    repos = _repo_names(spec)
    rng0 = np.random.default_rng(spec.seed)
    base = rng0.uniform(spec.base_len_lo, spec.base_len_hi, size=spec.n_repos)
    # one shared ASCII pool for content slicing
    pool = rng0.integers(97, 123, size=4_000_000, dtype=np.uint8)
    pool[rng0.integers(0, pool.size, pool.size // 8)] = 32  # sprinkle spaces
    pool = pool.tobytes()
    # monorepo skew: ~30% of rows (exercises salted repartition downstream)
    w = np.full(spec.n_repos, 0.7 / (spec.n_repos - 1))
    w[MONOREPO] = 0.3
    # per-repo lang profile
    lang_w = rng0.dirichlet(np.ones(len(LANGS)) * 2.0, size=spec.n_repos)

    expected = {
        "range": [], "uniqueness": [], "referential": [],
        "staleness": {"repo": repos[STOPPED], "last_part": spec.stop_part},
        "trend_up": repos[TREND_UP], "trend_down": repos[TREND_DOWN],
        "step": {"repo": repos[STEP], "part": spec.n_parts // 2,
                 "size": spec.step_size},
        "spike": {"repo": repos[SPIKE], "part": spec.n_parts // 2 + 1,
                  "size": spec.spike_size},
        "lang_shift": {"part": spec.lang_shift_part, "lang": spec.shift_lang,
                       "frac": spec.lang_shift_frac},
        "control": repos[CONTROL],
        "spec": asdict(spec),
    }

    # deterministic allocation of planted rows across (part, kind)
    plant_rng = np.random.default_rng(spec.seed + 999)
    oor_parts = plant_rng.integers(0, spec.n_parts, spec.n_out_of_range)
    dup_parts = plant_rng.integers(0, spec.n_parts, spec.n_duplicates)
    ref_parts = plant_rng.integers(0, spec.n_parts, spec.n_dangling)

    for part in range(spec.n_parts):
        rng = np.random.default_rng(spec.seed * 1_000_003 + part)
        # sample repos for this part; the stopped repo vanishes after stop_part
        pw = w.copy()
        if part > spec.stop_part:
            pw[STOPPED] = 0.0
            pw /= pw.sum()
        ridx = rng.choice(spec.n_repos, size=spec.rows_per_part, p=pw)
        means = np.array([repo_mean_len(spec, i, part, base) for i in range(spec.n_repos)])
        lengths = np.maximum(
            np.rint(rng.normal(means[ridx], spec.jitter_sd)).astype("int64"),
            spec.min_len + 10,
        )
        # rows are ordered; ordinal gives unique path/commit
        ordinal = np.arange(spec.rows_per_part)
        # vectorized per-repo multinomial: inverse-CDF against each row's
        # repo-specific cumulative lang weights (a per-row rng.choice would be
        # ~1000x slower at bench scale)
        cum = np.cumsum(lang_w, axis=1)
        u = rng.random(spec.rows_per_part)
        lang_idx = (u[:, None] > cum[ridx]).sum(axis=1)
        lang = LANGS[np.minimum(lang_idx, len(LANGS) - 1)]
        if part == spec.lang_shift_part and spec.lang_shift_frac > 0:
            shift_mask = rng.random(spec.rows_per_part) < spec.lang_shift_frac
            lang = lang.copy()
            lang[shift_mask] = spec.shift_lang
        repo_col = np.array([repos[i] for i in ridx], dtype=object)
        path_col = np.array(
            [f"src/m{int(o) % 37}/f{part}_{int(o)}.{l}" for o, l in zip(ordinal, lang)],
            dtype=object,
        )
        commit_col = np.array(
            [hashlib.sha1(f"{r}:{part}:{int(o)}".encode()).hexdigest()
             for r, o in zip(repo_col, ordinal)],
            dtype=object,
        )

        # ---- plant out-of-range lengths (never in the control repo) -------
        n_oor = int((oor_parts == part).sum())
        if n_oor:
            cand = np.flatnonzero(ridx != CONTROL)[:n_oor * 7:7]
            cand = cand[:n_oor]
            low = rng.integers(1, 181, size=cand.size)
            high = rng.integers(spec.max_len + 20, spec.max_len + 1001, size=cand.size)
            pick_low = rng.random(cand.size) < 0.5
            lengths[cand] = np.where(pick_low, low, high)
            for j in cand:
                expected["range"].append(
                    {"part": part, "repo": str(repo_col[j]), "path": str(path_col[j]),
                     "commit": str(commit_col[j]), "length": int(lengths[j])}
                )

        content = _make_content(rng, lengths, pool)

        # ---- plant null content (never in the control repo) ---------------
        if spec.null_part == part and spec.null_frac > 0:
            null_mask = (rng.random(spec.rows_per_part) < spec.null_frac) & (
                ridx != CONTROL
            )
            for j in np.flatnonzero(null_mask):
                content[int(j)] = None
            expected["null_rate"] = {
                "part": part, "n_null": int(null_mask.sum()),
                "frac": float(null_mask.sum()) / spec.rows_per_part,
            }

        tbl = {
            "repo": list(repo_col), "path": list(path_col),
            "commit": list(commit_col), "lang": [str(x) for x in lang],
            "content": content,
            "part": [part] * spec.rows_per_part,
        }

        # ---- plant duplicates: same (repo,path,commit), different content --
        n_dup = int((dup_parts == part).sum())
        for d in range(n_dup):
            j = int(rng.integers(0, spec.rows_per_part))
            while ridx[j] == CONTROL:
                j = int(rng.integers(0, spec.rows_per_part))
            L = int(np.clip(lengths[j] + 17, spec.min_len + 10, spec.max_len - 10))
            off = int(rng.integers(0, len(pool) - L - 1))
            tbl["repo"].append(tbl["repo"][j]); tbl["path"].append(tbl["path"][j])
            tbl["commit"].append(tbl["commit"][j]); tbl["lang"].append(tbl["lang"][j])
            tbl["content"].append(pool[off:off + L].decode("ascii"))
            tbl["part"].append(part)
            expected["uniqueness"].append(
                {"part": part, "repo": tbl["repo"][j], "path": tbl["path"][j],
                 "commit": tbl["commit"][j]}
            )

        # ---- plant dangling repo references --------------------------------
        n_ref = int((ref_parts == part).sum())
        for d in range(n_ref):
            ghost = f"ghost/repo{int(rng.integers(0, 5))}"
            L = int(rng.integers(spec.min_len + 50, spec.max_len - 50))
            off = int(rng.integers(0, len(pool) - L - 1))
            o = spec.rows_per_part + n_dup + d
            tbl["repo"].append(ghost)
            tbl["path"].append(f"src/g/f{part}_{o}.py")
            tbl["commit"].append(hashlib.sha1(f"{ghost}:{part}:{o}".encode()).hexdigest())
            tbl["lang"].append("py")
            tbl["content"].append(pool[off:off + L].decode("ascii"))
            tbl["part"].append(part)
            expected["referential"].append(
                {"part": part, "repo": ghost, "path": tbl["path"][-1],
                 "commit": tbl["commit"][-1]}
            )

        at = pa.table(
            {
                "repo": pa.array(tbl["repo"], pa.string()),
                "path": pa.array(tbl["path"], pa.string()),
                "commit": pa.array(tbl["commit"], pa.string()),
                "lang": pa.array(tbl["lang"], pa.string()),
                "content": pa.array(tbl["content"], pa.large_string()),
                "part": pa.array(tbl["part"], pa.int32()),
            }
        )
        pdir = os.path.join(out_dir, f"part={part}")
        os.makedirs(pdir, exist_ok=True)
        pq.write_table(at, os.path.join(pdir, "data.parquet"))

    # repos manifest for the referential check (ghost/* intentionally absent)
    pq.write_table(
        pa.table({"repo": pa.array(repos, pa.string())}),
        os.path.join(out_dir, "repos.parquet"),
    )
    with open(os.path.join(out_dir, "expected_violations.json"), "w") as f:
        json.dump(expected, f, indent=1)
    return expected


def main() -> None:  # pragma: no cover
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--parts", type=int, default=8)
    ap.add_argument("--rows-per-part", type=int, default=2000)
    a = ap.parse_args()
    spec = CorpusSpec(seed=a.seed, n_parts=a.parts, rows_per_part=a.rows_per_part)
    generate_corpus(a.out_dir, spec)


if __name__ == "__main__":  # pragma: no cover
    main()
