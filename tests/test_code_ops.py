"""Unit tests for the clone / license / import code-payload operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from dedupe_spark.operators.clones import (
    clone_groups,
    clone_keys,
    normalize_code_col,
    normalization_steps,
)
from dedupe_spark.operators.imports import (
    dependency_census,
    extract_imports,
)
from dedupe_spark.operators.licenses import (
    detect_license,
    filter_permissive,
)

import pytest


def _norm(spark, text: str, level: str) -> str:
    df = spark.createDataFrame([(text,)], "content string")
    return df.select(
        normalize_code_col(F.col("content"), level).alias("n")
    ).first()["n"]


# ---------------------------------------------------------------------------
# clones
# ---------------------------------------------------------------------------


def test_type1_ignores_comments_and_layout(spark):
    a = "def f(x):\n    return x + 1\n"
    b = "// reviewed 2024\ndef f(x):\n\n\n  return   x + 1"
    c = "# different comment\ndef f(x):\n\treturn x + 1"
    assert _norm(spark, a, "type1") == _norm(spark, b, "type1")
    assert _norm(spark, a, "type1") == _norm(spark, c, "type1")


def test_type1_keeps_identifiers_distinct(spark):
    a = "def f(x):\n    return x + 1\n"
    b = "def g(y):\n    return y + 1\n"
    assert _norm(spark, a, "type1") != _norm(spark, b, "type1")
    # ... but type-2 folds them together
    assert _norm(spark, a, "type2") == _norm(spark, b, "type2")


def test_type2_folds_literals(spark):
    a = "total = price * 3"
    b = "sum_v = cost * 42.5"
    assert _norm(spark, a, "type2") == _norm(spark, b, "type2")


def test_strings_protect_comment_markers(spark):
    # The '#' lives inside a string literal — folding strings first means
    # the "comment" must NOT be stripped (the + 1 tail survives).
    a = 'x = "color: #fff" + 1'
    n = _norm(spark, a, "type1")
    assert "+ 1" in n
    assert "#fff" not in n  # the literal itself was folded to "S"


def test_block_comment_nongreedy(spark):
    # Non-greedy body: the second /* ... */ must survive stripping of the
    # first — i.e. code between two block comments is preserved.
    a = "/* one */ keep_me /* two */"
    assert _norm(spark, a, "type1") == "keep_me"


def test_normalization_idempotent(spark):
    texts = [
        "// c\ndef f_1(a_1):\n    return a_1 + 2\n",
        '/* b */ x = "s" + 3.14 # t',
        "",
    ]
    for t in texts:
        for level in ("type1", "type2"):
            once = _norm(spark, t, level)
            assert _norm(spark, once, level) == once


def test_clone_keys_adds_both_digests(spark):
    df = spark.createDataFrame([("def f(): pass",)], "content string")
    out = clone_keys(df)
    row = out.first()
    assert len(row["t1_sha"]) == 64 and len(row["t2_sha"]) == 64


def test_clone_groups_min_size(spark):
    rows = [
        ("a", "def f(x):\n    return x + 1"),
        ("b", "# v2\ndef f(x):\n  return x + 1"),   # type-1 clone of a
        ("c", "def g(y):\n    return y + 1"),        # type-2 only
        ("d", "completely different content"),
    ]
    df = spark.createDataFrame(rows, "path string, content string")
    t1 = clone_groups(df, level="type1")
    assert sorted(r["path"] for r in t1.collect()) == ["a", "b"]
    assert t1.first()["group_size"] == 2
    t2 = clone_groups(df, level="type2")
    assert sorted(r["path"] for r in t2.collect()) == ["a", "b", "c"]


def test_normalization_steps_rejects_bad_level():
    with pytest.raises(ValueError):
        normalization_steps("type3")


def test_clone_lang_gate_preserves_c_preprocessor(spark):
    # Two C files identical except for the #include target are NOT
    # type-1 clones (a '#' line is a directive, not a comment, in C).
    rows = [
        ("a", "c", '#include <a.h>\nint f() { return 1; }\n'),
        ("b", "c", '#include <b.h>\nint f() { return 1; }\n'),
        ("c", "python", "# comment one\ndef f():\n    return 1\n"),
        ("d", "python", "# comment two\ndef f():\n    return 1\n"),
    ]
    df = spark.createDataFrame(rows, "path string, lang string, content string")
    t1 = clone_groups(df, level="type1")
    # python pair merges (comments stripped); c pair does not
    assert sorted(r["path"] for r in t1.collect()) == ["c", "d"]
    # without a lang column the fallback strips both styles (documented
    # over-approximation) and the c pair over-merges
    t1_nolang = clone_groups(df.drop("lang"), level="type1")
    assert sorted(r["path"] for r in t1_nolang.collect()) == ["a", "b", "c", "d"]


def test_clone_groups_excludes_degenerate_rows(spark):
    rows = [
        ("a", "# just a license header\n"),   # comment-only -> empty norm
        ("b", "# another header\n"),          # would share the "" key
        ("c", "   \n\n"),                     # whitespace-only
        ("d", None),                          # NULL content
        ("e", "def f(x):\n    return x\n"),
        ("f", "# v2\ndef f(x):\n  return x\n"),
    ]
    df = spark.createDataFrame(rows, "path string, content string")
    t1 = clone_groups(df, level="type1")
    assert sorted(r["path"] for r in t1.collect()) == ["e", "f"]


# ---------------------------------------------------------------------------
# fork collapse
# ---------------------------------------------------------------------------


def _fork_corpus(spark):
    # r1 (3 files) ~ r2 (2 of r1's files) ~ r3 (2 of r2's files, 1 of r1's)
    # form one transitive cluster; r4 is unrelated.
    rows = [
        ("r1", "a"), ("r1", "b"), ("r1", "c"),
        ("r2", "a"), ("r2", "b"),
        ("r3", "b"), ("r3", "c"),
        ("r4", "x"), ("r4", "y"),
    ]
    return spark.createDataFrame(rows, "repo string, content string")


def test_fork_clusters_transitive_and_representative(spark):
    from dedupe_spark.operators.forks import fork_clusters

    got = {r["repo"]: r for r in fork_clusters(
        _fork_corpus(spark), threshold=0.3, min_shared=1
    ).collect()}
    assert set(got) == {"r1", "r2", "r3"}          # r4 is no fork
    assert {r["fork_cluster"] for r in got.values()} == {"r1"}  # min label
    assert got["r1"]["is_representative"]           # largest member (3)
    assert not got["r2"]["is_representative"]
    assert not got["r3"]["is_representative"]
    assert got["r1"]["n_files"] == 3


def test_collapse_forks_keeps_representative_and_singletons(spark):
    from dedupe_spark.operators.forks import collapse_forks

    out = collapse_forks(
        _fork_corpus(spark), threshold=0.3, min_shared=1
    ).collect()
    assert sorted({r["repo"] for r in out}) == ["r1", "r4"]
    assert len([r for r in out if r["repo"] == "r1"]) == 3  # all files kept


# ---------------------------------------------------------------------------
# pipeline normalize knob
# ---------------------------------------------------------------------------


def test_pipeline_normalize_clusters_reformatted_copies(spark):
    from dedupe_spark.config import PipelineConfig
    from dedupe_spark.operators.dedup import dedup_pipeline

    body = "def f(x):\n    return x + 1\n"
    rows = [
        ("r1", "a.py", "c", "py", body),
        ("r2", "b.py", "c", "py", "// reviewed\n" + body.replace("    ", "\t")),
        ("r3", "c.py", "c", "py", "def unrelated(q):\n    return q * 99\n"),
    ]
    schema = "repo string, path string, commit string, lang string, content string"
    df = spark.createDataFrame(rows, schema)

    raw = dedup_pipeline(df, PipelineConfig()).collect()
    assert all(r["cluster_id"] is None for r in raw)  # byte-distinct

    out = dedup_pipeline(df, PipelineConfig(normalize="type1")).collect()
    by_path = {r["path"]: r for r in out}
    assert by_path["a.py"]["cluster_id"] is not None
    assert by_path["a.py"]["cluster_id"] == by_path["b.py"]["cluster_id"]
    assert by_path["c.py"]["cluster_id"] is None
    # raw content and raw byte sizes are preserved in the output
    assert by_path["b.py"]["content"].startswith("// reviewed")
    assert by_path["b.py"]["size"] == len(rows[1][4].encode())


def test_pipeline_normalize_comment_only_is_degenerate(spark):
    from dedupe_spark.config import PipelineConfig
    from dedupe_spark.operators.dedup import dedup_pipeline

    schema = "repo string, path string, commit string, lang string, content string"
    df = spark.createDataFrame(
        [("r", "notes.py", "c", "py", "# only a comment\n// and another\n")],
        schema,
    )
    row = dedup_pipeline(df, PipelineConfig(normalize="type1")).first()
    assert row["error"] == "empty content"
    assert row["cluster_id"] is None


def test_pipeline_normalize_validation():
    from dedupe_spark.config import PipelineConfig

    with pytest.raises(ValueError):
        PipelineConfig(normalize="type3")


# ---------------------------------------------------------------------------
# licenses
# ---------------------------------------------------------------------------


def test_license_cascade(spark):
    rows = [
        ("mit", "Permission is hereby granted, free of charge, to anyone"),
        ("apache", "Licensed under the Apache License, Version 2.0"),
        ("gpl", "the GNU General Public License as published"),
        ("lgpl", "the GNU Lesser General Public License v2.1"),
        ("bsd", "Redistribution and use in source and binary forms"),
        ("unlic", "This is free and unencumbered software released"),
        ("none", "just some code"),
    ]
    df = spark.createDataFrame(rows, "k string, content string")
    got = {r["k"]: (r["license"], r["permissive"])
           for r in detect_license(df).collect()}
    assert got["mit"] == ("MIT", True)
    assert got["apache"] == ("Apache-2.0", True)
    assert got["gpl"] == ("GPL-family", False)
    assert got["lgpl"] == ("GPL-family", False)
    assert got["bsd"] == ("BSD", True)
    assert got["unlic"] == ("Unlicense", True)
    assert got["none"] == ("unknown", False)


def test_license_first_match_wins(spark):
    # Dual-licensed header mentioning MIT then GPL: cascade order says MIT.
    df = spark.createDataFrame(
        [("Permission is hereby granted, free of charge ... or, at your "
          "option, the GNU General Public License",)],
        "content string",
    )
    assert detect_license(df).first()["license"] == "MIT"


def test_filter_permissive_drops_unknown_and_gpl(spark):
    rows = [
        ("keep", "Permission is hereby granted, free of charge"),
        ("gpl", "GNU General Public License"),
        ("unk", "no license"),
    ]
    df = spark.createDataFrame(rows, "k string, content string")
    assert [r["k"] for r in filter_permissive(df).collect()] == ["keep"]


# ---------------------------------------------------------------------------
# imports
# ---------------------------------------------------------------------------


def test_extract_imports_all_conventions(spark):
    content = (
        "import os\n"
        "  import numpy.linalg\n"
        "from collections import deque\n"
        '#include <stdio.h>\n'
        '#include "local/hdr.h"\n'
        "const x = require('lodash');\n"
        'const y = require("@scope/pkg");\n'
    )
    df = spark.createDataFrame(
        [("r1", "f1", content)], "repo string, path string, content string"
    )
    mods = sorted(r["module"] for r in extract_imports(df).collect())
    assert mods == sorted(
        ["os", "numpy.linalg", "collections", "stdio.h", "local/hdr.h",
         "lodash", "@scope/pkg"]
    )


def test_extract_imports_ignores_midline_and_importless(spark):
    rows = [
        ("r1", "a", "x = 1  # we import nothing here\nimporting = 2"),
        ("r1", "b", "import real_module"),
    ]
    df = spark.createDataFrame(rows, "repo string, path string, content string")
    got = extract_imports(df).collect()
    assert [(r["path"], r["module"]) for r in got] == [("b", "real_module")]


# ---------------------------------------------------------------------------
# pyfuncs
# ---------------------------------------------------------------------------


def test_extract_py_functions_boundaries(spark):
    from dedupe_spark.operators.pyfuncs import extract_py_functions

    content = (
        "import os\n"
        "def first(x):\n"
        "    a = x + 1\n"
        "\n"
        "    return a\n"
        "print('top level')\n"
        "def second(y):\n"
        "    return y\n"
        "class C:\n"
        "    def method(self):\n"
        "        return 0\n"
    )
    df = spark.createDataFrame(
        [("r", "f", content)], "repo string, path string, content string"
    )
    got = extract_py_functions(df).collect()
    assert [r["fn_idx"] for r in got] == [0, 1]
    assert got[0]["fn_src"].startswith("def first")
    # blank line inside the body is kept, the top-level print is not
    assert "return a" in got[0]["fn_src"]
    assert "print" not in got[0]["fn_src"]
    assert got[1]["fn_src"].startswith("def second")
    # class-level def is not a top-level function
    assert "method" not in got[1]["fn_src"]


def _golden_bpe(word_counts, n_merges):
    """Reference BPE (Sennrich et al. 2016), same tie-break as the
    engine: count desc, then lexicographic pair order."""
    from collections import Counter

    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        stats = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += c
        if not stats:
            break
        (a, b), cnt = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((a, b))
        new = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new[key] = new.get(key, 0) + c
        vocab = new
    return merges


def test_learn_bpe_merges_matches_golden(spark):
    from collections import Counter

    from dedupe_spark.operators.bpe import learn_bpe_merges

    texts = [
        "low low low lower lower newest newest newest",
        "newest newest newest widest widest widest new",
        "the cat sat on the mat the end",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = learn_bpe_merges(df, "text", n_merges=8)

    words = Counter(w for t in texts for w in t.split())
    want = _golden_bpe(words, 8)
    assert got == want


def test_bpe_merge_overlapping_run_is_greedy(spark):
    from dedupe_spark.operators.bpe import segment_words

    df = spark.createDataFrame([("aaa",), ("aaaa",)], "word string")
    got = {
        r["word"]: r["tokens"]
        for r in segment_words(df, [("a", "a")]).collect()
    }
    # greedy left-to-right: "aaa" -> [aa, a], "aaaa" -> [aa, aa]
    assert got == {"aaa": ["aa", "a"], "aaaa": ["aa", "aa"]}


def test_segment_words_applies_merges_in_order(spark):
    from dedupe_spark.operators.bpe import segment_words

    df = spark.createDataFrame([("lowest",)], "word string")
    merges = [("l", "o"), ("lo", "w"), ("e", "s"), ("es", "t")]
    got = segment_words(df, merges).first()["tokens"]
    assert got == ["low", "est"]


def test_learn_bpe_stops_when_no_repeated_pair(spark):
    from dedupe_spark.operators.bpe import learn_bpe_merges

    df = spark.createDataFrame([("ab cd",)], "text string")
    # every pair occurs once -> no merge is worth learning
    assert learn_bpe_merges(df, "text", n_merges=5) == []


def test_snapshot_diff_statuses(spark):
    from dedupe_spark.operators.snapshots import diff_summary, snapshot_diff

    schema = "repo string, path string, content string"
    old = spark.createDataFrame(
        [
            ("r", "same.py", "a"),
            ("r", "edit.py", "b"),
            ("r", "gone.py", "c"),
            ("r", "nullboth.py", None),   # NULL content, present both sides
        ],
        schema,
    )
    new = spark.createDataFrame(
        [
            ("r", "same.py", "a"),
            ("r", "edit.py", "B2"),
            ("r", "fresh.py", "d"),
            ("r", "nullboth.py", None),
        ],
        schema,
    )
    d = snapshot_diff(old, new)
    got = {r["path"]: r["status"] for r in d.collect()}
    assert got == {
        "same.py": "unchanged",
        "edit.py": "modified",
        "gone.py": "removed",
        "fresh.py": "added",
        # presence is tracked by markers, not sha nullness: a NULL-content
        # row present in both snapshots is unchanged, not added/removed
        "nullboth.py": "unchanged",
    }
    s = diff_summary(d).first()
    assert (s["n_added"], s["n_removed"], s["n_modified"], s["n_unchanged"]) == (
        1, 1, 1, 2,
    )


def test_snapshot_diff_precomputed_sha_col(spark):
    from dedupe_spark.operators.snapshots import snapshot_diff

    schema = "repo string, path string, sha string"
    old = spark.createDataFrame([("r", "a", "s1"), ("r", "b", "s2")], schema)
    new = spark.createDataFrame([("r", "a", "s1"), ("r", "b", "sX")], schema)
    got = {
        r["path"]: r["status"]
        for r in snapshot_diff(old, new, sha_col="sha").collect()
    }
    assert got == {"a": "unchanged", "b": "modified"}


def test_extract_docstring_pairs(spark):
    from dedupe_spark.operators.pyfuncs import extract_docstring_pairs

    content = (
        'def dq(x):\n    """Add one.\n    Returns x+1."""\n    return x + 1\n'
        "\n"
        "def sq(y):\n    '''single style'''\n    return y\n"
        "\n"
        "def bare(z):\n    return z\n"
        "\n"
        'def stub(q):\n    """doc only, no body"""\n'
    )
    df = spark.createDataFrame(
        [("r", "f", content)], "repo string, path string, content string"
    )
    rows = {r["fn_name"]: r for r in extract_docstring_pairs(df).collect()}
    # undocumented and docstring-only functions are dropped
    assert sorted(rows) == ["dq", "sq"]
    assert rows["dq"]["docstring"] == "Add one.\n    Returns x+1."
    assert rows["dq"]["code"] == "return x + 1"
    assert rows["dq"]["fn_idx"] == 0
    assert rows["sq"]["docstring"] == "single style"
    assert rows["sq"]["code"] == "return y"


def test_extract_docstring_pairs_first_statement_only(spark):
    from dedupe_spark.operators.pyfuncs import extract_docstring_pairs

    # a triple-quoted literal that is NOT the first statement is code,
    # not a docstring (PEP 257)
    content = 'def f(x):\n    y = 1\n    """not a docstring"""\n    return y\n'
    df = spark.createDataFrame(
        [("r", "f", content)], "repo string, path string, content string"
    )
    assert extract_docstring_pairs(df).count() == 0


def test_function_clone_census_levels(spark):
    from dedupe_spark.operators.pyfuncs import function_clone_census

    rows = [
        ("r1", "def f(x):\n    return x + 1\n"),
        ("r2", "# note\ndef f(x):\n    return x + 1\n"),  # type-1 clone
        ("r3", "def g(y):\n    return y + 2\n"),          # type-2 only
        ("r4", "def h():\n    pass\n"),                    # singleton
    ]
    df = spark.createDataFrame(rows, "repo string, content string")
    t1 = function_clone_census(df, level="type1").collect()
    assert len(t1) == 1 and t1[0]["n_copies"] == 2 and t1[0]["n_repos"] == 2
    t2 = function_clone_census(df, level="type2").collect()
    assert len(t2) == 1 and t2[0]["n_copies"] == 3
    # sample_src is the lexicographic min of the raw (unnormalized) sources
    assert t2[0]["sample_src"].startswith("# note") is False
    assert t2[0]["sample_src"].startswith("def f")


# ---------------------------------------------------------------------------
# pathfilters
# ---------------------------------------------------------------------------


def test_path_classification(spark):
    from dedupe_spark.operators.pathfilters import classify_paths

    rows = [
        ("src/main.py", "normal"),
        ("node_modules/lodash/index.js", "vendored"),
        ("deep/vendor/pkg/mod.go", "vendored"),
        ("assets/app.min.js", "minified"),
        ("proto/msg_pb2.py", "generated"),
        ("package-lock.json", "generated"),
        ("tests/unit/test_x.py", "test"),
        ("pkg/foo_test.go", "test"),
        ("src/Button.test.tsx", "test"),
        # first-match: minified beats vendored
        ("node_modules/x/y.min.js", "minified"),
        # substrings must not trigger: 'mytests/' is not 'tests/'
        ("mytests/vendored_data.py", "normal"),
    ]
    df = spark.createDataFrame(rows, "path string, want string")
    for r in classify_paths(df).collect():
        assert r["path_class"] == r["want"], r["path"]


def test_filter_clean_paths_keeps_tests(spark):
    from dedupe_spark.operators.pathfilters import filter_clean_paths

    rows = [("src/a.py",), ("vendor/b.go",), ("tests/test_c.py",)]
    df = spark.createDataFrame(rows, "path string")
    got = sorted(r["path"] for r in filter_clean_paths(df).collect())
    assert got == ["src/a.py", "tests/test_c.py"]


def test_dependency_census_counts(spark):
    rows = [
        ("r1", "import a\nimport b"),
        ("r1", "import a"),
        ("r2", "import a"),
    ]
    df = spark.createDataFrame(rows, "repo string, content string")
    got = {r["module"]: (r["n_imports"], r["n_repos"])
           for r in dependency_census(df).collect()}
    assert got == {"a": (3, 2), "b": (1, 1)}
