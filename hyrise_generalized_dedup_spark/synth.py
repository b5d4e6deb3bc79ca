"""Deterministic synthetic `code_files` corpus (FIXTURES.md F1).

Shape fixed by BASELINE.json input_hint:
(repo:string, path:string, commit:string, lang:string, content:string).

Row classes (every class present, proportions per FIXTURES.md):
unique ~40%, exact duplicates ~15%, near duplicates ~25% (k seeded edits,
ground-truth pair list emitted), shared-substring ~10%, edge cases ~10%,
plus a hot "vendored library" family across ~20% of repos (LSH skew).

Everything derives from ``random.Random(seed)`` — no wall clock, no
PYTHONHASHSEED. Two invocations with the same (seed, n_rows) produce
identical corpora (FIXTURES.md F4.5).
"""

from __future__ import annotations

import hashlib
import random
from dataclasses import dataclass

LANGS = ["py", "java", "c", "js", "go", "md"]
LANG_W = [0.3, 0.2, 0.15, 0.15, 0.1, 0.1]

_KEYWORDS = {
    "py": ["def", "class", "return", "import", "for", "if", "with", "yield"],
    "java": ["public", "class", "return", "import", "for", "if", "static", "void"],
    "c": ["int", "struct", "return", "include", "for", "if", "static", "void"],
    "js": ["function", "const", "return", "import", "for", "if", "let", "async"],
    "go": ["func", "type", "return", "import", "for", "if", "var", "defer"],
    "md": ["#", "##", "-", "*", ">", "```", "[link]", "**bold**"],
}
_IDENTS = [
    "config", "handler", "buffer", "index", "value", "result", "stream",
    "table", "chunk", "segment", "cursor", "worker", "queue", "batch",
    "offset", "schema", "record", "parser", "writer", "reader",
]
_EXPRS = ["0", "1", "42", "None", "true", "x + y", "f(x)", "a[i]", "n - 1", "len(data)"]


@dataclass
class SynthCorpus:
    rows: list[tuple[str, str, str, str, str]]  # (repo, path, commit, lang, content)
    dup_pairs: list[tuple[str, str]]            # ground-truth near-dup (commit_a, commit_b)
    exact_groups: list[list[str]]               # commit groups that are byte-identical


def _commit(repo: str, path: str, rev: int) -> str:
    return hashlib.sha1(f"{repo}:{path}:{rev}".encode()).hexdigest()


def _gen_file(rng: random.Random, lang: str, n_lines: int) -> str:
    kws = _KEYWORDS[lang]
    lines = []
    # per-file entropy: wide identifier suffixes + a random hex literal per
    # line so unrelated files share few 8-byte shingles (a tiny vocabulary
    # would give ALL same-language files jaccard ~0.4 and make the LSH
    # candidate set quadratic in corpus size — unrealistic for real code)
    for _ in range(n_lines):
        kw = rng.choice(kws)
        ident = rng.choice(_IDENTS) + f"_{rng.randrange(10**6):x}"
        expr = rng.choice(_EXPRS)
        indent = " " * (4 * rng.randrange(3))
        lines.append(f"{indent}{kw} {ident} = {expr}  // 0x{rng.randrange(16**8):08x}")
    return "\n".join(lines) + "\n"


def _edit(rng: random.Random, content: str, k: int) -> str:
    """Apply k seeded edits: line insert / token rename / line delete."""
    lines = content.split("\n")
    for _ in range(k):
        op = rng.randrange(3)
        if op == 0:  # insert
            pos = rng.randrange(len(lines) + 1)
            lines.insert(pos, f"    inserted_{rng.randrange(1000)} = {rng.choice(_EXPRS)}")
        elif op == 1 and lines:  # rename token
            pos = rng.randrange(len(lines))
            lines[pos] = lines[pos].replace("a", f"z{rng.randrange(10)}", 1)
        elif lines:  # delete
            lines.pop(rng.randrange(len(lines)))
    return "\n".join(lines)


def generate(
    n_rows: int = 200,
    seed: int = 42,
    base_index: int = 0,
    vendored_content: str | None = None,
) -> SynthCorpus:
    """Driver-side generator. base_index offsets repo/path/commit identity
    so disjoint ranges generated independently (generate_distributed) never
    collide; vendored_content pins the global skew family across ranges."""
    rng = random.Random(seed)
    rows: list[tuple[str, str, str, str, str]] = []
    dup_pairs: list[tuple[str, str]] = []
    exact_groups: list[list[str]] = []

    n_unique = int(n_rows * 0.40)
    n_exact = int(n_rows * 0.15)
    n_near = int(n_rows * 0.25)
    n_shared = int(n_rows * 0.10)
    n_edge = n_rows - n_unique - n_exact - n_near - n_shared

    def add_row(i: int, lang: str, content: str, rev: int = 0) -> str:
        gi = base_index + i
        repo = f"org{gi // 50}/repo{gi % 97}"
        ext = lang if lang != "md" else "md"
        path = f"src/pkg_{gi % 13}/mod_{gi}.{ext}"
        commit = _commit(repo, path, rev)
        rows.append((repo, path, commit, lang, content))
        return commit

    # tier 1: unique files
    originals: list[tuple[str, str]] = []  # (lang, content)
    for i in range(n_unique):
        lang = rng.choices(LANGS, LANG_W)[0]
        content = _gen_file(rng, lang, rng.randrange(20, 80))
        add_row(i, lang, content)
        originals.append((lang, content))

    # vendored-library skew family: one content duplicated across ~20% of repos
    vendored = vendored_content if vendored_content is not None else _gen_file(rng, "js", 60)

    # tier 2: exact duplicates of tier-1 files (plus the vendored family)
    base_i = n_unique
    for j in range(n_exact):
        i = base_i + j
        if j % 3 == 0:
            c = add_row(i, "js", vendored, rev=1)
            if exact_groups and rows[len(rows) - 2][4] == vendored:
                exact_groups[-1].append(c)
            else:
                exact_groups.append([c])
        else:
            src = rng.randrange(len(originals))
            lang, content = originals[src]
            c = add_row(i, lang, content, rev=1)
            orig_commit = rows[src][2]
            exact_groups.append([orig_commit, c])

    # tier 3: near duplicates — k seeded edits, ground truth emitted
    base_i += n_exact
    for j in range(n_near):
        i = base_i + j
        src = rng.randrange(len(originals))
        lang, content = originals[src]
        k = rng.choice([1, 3, 10])
        edited = _edit(rng, content, k)
        c = add_row(i, lang, edited, rev=2)
        dup_pairs.append((rows[src][2], c))

    # tier 4: shared-substring files — long common block inside unique
    # noise. Block family count scales with corpus size (~200 members per
    # block): real corpora share MANY distinct boilerplate blocks, not one
    # global block, and a single n-member block family would make the
    # LSH candidate set quadratic in n by construction.
    base_i += n_near
    n_blocks = max(1, n_shared // 200)
    shared_blocks = [_gen_file(rng, "c", 40) for _ in range(n_blocks)]  # >= 4x chunk_size
    for j in range(n_shared):
        i = base_i + j
        pre = _gen_file(rng, "c", rng.randrange(5, 20))
        post = _gen_file(rng, "c", rng.randrange(5, 20))
        add_row(i, "c", pre + shared_blocks[rng.randrange(n_blocks)] + post, rev=3)

    # tier 5: edge cases
    base_i += n_shared
    edge_contents = [
        "",
        "x",
        "y" * 64,
        "z" * 63,
        "w" * 65,
        "line\r\nline\r\n" * 30,
        "héllo wörld 中文注释 🚀 مرحبا\n" * 20,
        ("s" * 64) * 8,  # every segment identical
        _gen_file(rng, "py", 2000),  # large file
    ]
    for j in range(n_edge):
        i = base_i + j
        content = edge_contents[j % len(edge_contents)]
        lang = LANGS[j % len(LANGS)]
        add_row(i, lang, content, rev=4)

    return SynthCorpus(rows=rows, dup_pairs=dup_pairs, exact_groups=exact_groups)


def to_spark(spark, corpus: SynthCorpus):
    return spark.createDataFrame(
        corpus.rows, "repo string, path string, commit string, lang string, content string"
    )


_SCHEMA = "repo string, path string, commit string, lang string, content string"


def generate_distributed(spark, n_rows: int, seed: int = 42, rows_per_task: int = 5000):
    """Generate the corpus IN SPARK — one mapInPandas task per id-range.

    Driver-side generate() is single-core Python; at 10^6+ rows corpus
    creation dominated the scaling benchmark (round-1 finding). Here the
    driver only enumerates (task, start, count) ranges; each executor task
    runs generate() for its range with a range-derived seed and a
    base_index offset (so repo/path/commit identities never collide), and
    the global vendored-library skew family is pinned by passing the same
    vendored content to every range. Deterministic for fixed
    (n_rows, seed, rows_per_task) regardless of parallelism."""
    import pandas as pd

    n_tasks = (n_rows + rows_per_task - 1) // rows_per_task
    vendored = _gen_file(random.Random(seed * 1_000_003 + 777), "js", 60)
    ranges = [
        (t, t * rows_per_task, min(rows_per_task, n_rows - t * rows_per_task))
        for t in range(n_tasks)
    ]
    rdf = spark.createDataFrame(ranges, "task int, start long, n int")

    def gen(batches):
        for pdf in batches:
            for task, start, n in pdf.itertuples(index=False):
                corpus = generate(
                    n_rows=int(n),
                    seed=seed * 1_000_003 + int(task),
                    base_index=int(start),
                    vendored_content=vendored,
                )
                yield pd.DataFrame(
                    corpus.rows, columns=["repo", "path", "commit", "lang", "content"]
                )

    return rdf.repartition(n_tasks, "task").mapInPandas(gen, _SCHEMA)
