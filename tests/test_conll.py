"""CoNLL read/write parity — fixtures reproduced from the reference test
suite (tests/model/test_CoNLLDataset.py:64-140): typed tags must collapse to
their first char, trailing blank lines are tolerated, and write→read
round-trips byte-exactly (the filecmp test, :51-60)."""

from __future__ import annotations

from bioner_spark.io.conll import read_conll, write_conll

TYPED_CONTENT = """-DOCSTART-	0	0	O

Lorem	0	5	B-T116,T123
ipsum	6	10	I-T047
dolor	11	16	O

Eirmod	0	5	B-T116,T123
tempor	6	8	O
.	9	10	O

-DOCSTART-	0	0	O

ut	0	5	B-UnknownType
labore	6	8	O
et	9	10	O

dolore	0	5	O
magna	6	8	O
aliquyam	9	10	O
"""

UNTYPED_CONTENT = TYPED_CONTENT.replace("B-T116,T123", "B").replace("I-T047", "I").replace(
    "B-UnknownType", "B"
) + "\n"


def _parse(spark, tmp_path, content, name="f.txt"):
    p = tmp_path / name
    p.write_text(content, encoding="utf8")
    return read_conll(spark, str(p)).orderBy("doc_id", "sentence_id", "token_id")


def _expected():
    return [
        (0, 0, 0, "Lorem", 0, 5, "B"),
        (0, 0, 1, "ipsum", 6, 10, "I"),
        (0, 0, 2, "dolor", 11, 16, "O"),
        (0, 1, 0, "Eirmod", 0, 5, "B"),
        (0, 1, 1, "tempor", 6, 8, "O"),
        (0, 1, 2, ".", 9, 10, "O"),
        (1, 0, 0, "ut", 0, 5, "B"),
        (1, 0, 1, "labore", 6, 8, "O"),
        (1, 0, 2, "et", 9, 10, "O"),
        (1, 1, 0, "dolore", 0, 5, "O"),
        (1, 1, 1, "magna", 6, 8, "O"),
        (1, 1, 2, "aliquyam", 9, 10, "O"),
    ]


def _rows(df):
    return [
        (int(r.doc_id.rsplit("#", 1)[1]), r.sentence_id, r.token_id, r.text, r.start, r.end, r.tag)
        for r in df.collect()
    ]


def test_read_crlf_terminators(spark, tmp_path):
    """CRLF files parse identically to LF (the reference reads in Python
    text mode = universal newlines; a bare '\\n' split would turn blank
    separators into 1-char '\\r' token rows and lose sentence bounds)."""
    p = tmp_path / "crlf.txt"
    p.write_bytes(TYPED_CONTENT.replace("\n", "\r\n").encode("utf8"))
    df = read_conll(spark, str(p)).orderBy("doc_id", "sentence_id", "token_id")
    assert _rows(df) == _expected()


def test_eval_export_mismatch_raises(spark, tmp_path):
    """A token present on only one side fails the export loudly instead of
    writing a sentence with holes for conlleval.pl to mis-score."""
    import pytest

    from bioner_spark.io.conll import write_eval_conll

    gold = spark.createDataFrame(
        [("d", 0, 0, "a", "B"), ("d", 0, 1, "b", "O")],
        "doc_id string, sentence_id int, token_id int, text string, tag string",
    )
    pred_short = gold.filter("token_id = 0")
    with pytest.raises(Exception, match="only one side"):
        write_eval_conll(gold, pred_short, str(tmp_path / "e1.txt"))
    pred_extra = gold.union(
        spark.createDataFrame(
            [("d", 0, 2, "c", "O")],
            "doc_id string, sentence_id int, token_id int, text string, tag string",
        )
    )
    with pytest.raises(Exception, match="only one side"):
        write_eval_conll(gold, pred_extra, str(tmp_path / "e2.txt"))


def test_read_typed_tags_collapse(spark, tmp_path):
    df = _parse(spark, tmp_path, TYPED_CONTENT)
    assert _rows(df) == _expected()


def test_read_trailing_blank_lines(spark, tmp_path):
    df = _parse(spark, tmp_path, TYPED_CONTENT + "\n\n")
    assert _rows(df) == _expected()


def test_write_read_roundtrip(spark, tmp_path):
    df = _parse(spark, tmp_path, UNTYPED_CONTENT, "in.txt")
    out = tmp_path / "out.txt"
    write_conll(df, str(out))
    assert out.read_text(encoding="utf8") == UNTYPED_CONTENT


def test_eval_export_format(spark, tmp_path):
    from bioner_spark.io.conll import write_eval_conll

    gold = _parse(spark, tmp_path, UNTYPED_CONTENT, "g.txt")
    pred = gold.withColumn("tag", gold["tag"])
    out = tmp_path / "eval.txt"
    write_eval_conll(gold, pred, str(out))
    text = out.read_text(encoding="utf8")
    assert "\nLorem B B\nipsum I I\ndolor O O\n" in text
    # blank line BEFORE each sentence (dataset_to_conll_file.py:12-16)
    assert text.startswith("\n")


def test_write_distributed_concat_parity(spark, tmp_path):
    """Concatenating the distributed writer's part files in name order must
    reproduce the single-file bytes exactly. 12 docs: covers the
    strip-exactly-one-newline rule (regexp '\\n$' strips two — Java $ also
    matches before a final terminator) AND numeric doc ordering
    (unpadded lexicographic doc_ids would emit doc 10 before doc 2)."""
    import glob

    from bioner_spark.io.conll import write_conll_distributed

    content = "".join(
        f"-DOCSTART-\t0\t0\tO\n\nw{i}\t0\t2\tB\nx{i}\t3\t5\tO\n\n"
        for i in range(12)
    )
    df = _parse(spark, tmp_path, content, "in12.txt")
    out_dir = tmp_path / "dist"
    write_conll_distributed(df, str(out_dir), num_files=4)
    parts = sorted(glob.glob(str(out_dir / "part-*")))
    cat = "".join(open(p, encoding="utf8").read() for p in parts)
    assert cat == content


def test_read_conll_malformed_row_raises(spark, tmp_path):
    """A token line with fewer than 4 tab columns must fail at scan time,
    not flow NULL start/end/tag into downstream stages."""
    import pytest
    from pyspark.errors import PySparkException

    from bioner_spark.io.conll import read_conll

    p = tmp_path / "bad.conll"
    p.write_text("-DOCSTART-\t0\t0\tO\n\nAspirin\t0\n\n")
    with pytest.raises(PySparkException, match="malformed token row"):
        read_conll(spark, str(p)).collect()


def test_read_conll_non_integer_offset_raises(spark, tmp_path):
    """Present-but-non-integer offsets must fail loudly too: in non-ANSI
    mode cast('int') on 'foo' yields a silent NULL offset — the same
    hazard the missing-column guard closes."""
    import pytest
    from pyspark.errors import PySparkException

    from bioner_spark.io.conll import read_conll

    p = tmp_path / "bad_offset.conll"
    p.write_text("-DOCSTART-\t0\t0\tO\n\nAspirin\tfoo\tbar\tB-X\n\n")
    with pytest.raises(PySparkException, match="non-int32 start"):
        read_conll(spark, str(p)).collect()


def test_read_conll_overflow_offset_raises(spark, tmp_path):
    """int32-overflow offsets pass a digits-only regex but cast('int')
    NULLs them in non-ANSI mode — the same silent-NULL class; must raise."""
    import pytest
    from pyspark.errors import PySparkException

    from bioner_spark.io.conll import read_conll

    p = tmp_path / "overflow.conll"
    p.write_text("-DOCSTART-\t0\t0\tO\n\nAspirin\t99999999999\t5\tB-X\n\n")
    with pytest.raises(PySparkException, match="non-int32 start"):
        read_conll(spark, str(p)).collect()


def test_read_conll_python_int_lexical_forms_accepted(spark, tmp_path):
    """'+5' and space-padded offsets parse fine in the reference (Python
    int()) and in a plain CAST — the loud guard must not reject them."""
    from bioner_spark.io.conll import read_conll

    p = tmp_path / "signed.conll"
    p.write_text("-DOCSTART-\t0\t0\tO\n\nAspirin\t+5\t 12 \tB-X\n\n")
    rows = read_conll(spark, str(p)).collect()
    tok = [r for r in rows if r["text"] == "Aspirin"]
    assert tok and tok[0]["start"] == 5 and tok[0]["end"] == 12


def test_read_conll_empty_tag_raises(spark, tmp_path):
    """A present-but-empty 4th field passes the missing-column guard but
    the reference's tag[0] (conll_dataset.py:83) IndexErrors — the scan
    must not emit a silent '' tag."""
    import pytest
    from pyspark.errors import PySparkException

    from bioner_spark.io.conll import read_conll

    p = tmp_path / "bad_tag.conll"
    p.write_text("-DOCSTART-\t0\t0\tO\n\na\t0\t1\t\n\n")
    with pytest.raises(PySparkException, match="empty tag"):
        read_conll(spark, str(p)).collect()


def test_read_conll_headerless_prefix_is_document_zero(spark, tmp_path):
    """Token rows before the first -DOCSTART- previously carried doc_ord -1,
    rendering the malformed id suffix '0000000-1' (breaking zero-padded
    lexicographic order). They are document 0; headed docs after them shift
    up by one; fully-headed files are unchanged."""
    p = tmp_path / "headerless.conll"
    p.write_text(
        "pre\t0\t3\tO\n"
        "\n"
        "-DOCSTART-\t0\t0\tO\n"
        "tok\t0\t3\tB-X\n"
    )
    rows = read_conll(spark, str(p)).collect()
    ords = sorted({r.doc_id.rsplit("#", 1)[1] for r in rows})
    assert ords == ["000000000", "000000001"]
    by_ord = {r.doc_id.rsplit("#", 1)[1]: r.text for r in rows}
    assert by_ord["000000000"] == "pre"
    assert by_ord["000000001"] == "tok"


def test_read_conll_empty_first_document_keeps_numbering(spark, tmp_path):
    """The headerless-prefix shift applies ONLY when a file opens with
    token rows (min ordinal -1). A file whose FIRST headed document is
    token-free keeps its numbering gap — exactly like a mid-file empty
    document — instead of silently renumbering every later doc down."""
    p = tmp_path / "empty_first.conll"
    p.write_text(
        "-DOCSTART-\t0\t0\tO\n"
        "\n"
        "-DOCSTART-\t0\t0\tO\n"
        "tok\t0\t3\tB-X\n"
    )
    rows = read_conll(spark, str(p)).collect()
    assert sorted({r.doc_id.rsplit("#", 1)[1] for r in rows}) == ["000000001"]
