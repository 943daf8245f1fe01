"""Classic query parser: grammar unit tests + end-to-end equivalence of
parsed execution vs direct engine calls."""

from lucene_spark.oracle import assert_rank_identical
from lucene_spark.search.queryparser import execute, parse


def test_bare_terms_implicit_or():
    p = parse("license apache software")
    assert p.should == ["license", "apache", "software"]
    assert not p.must and not p.must_not and not p.phrases


def test_and_promotes_both():
    p = parse("license AND apache")
    assert p.must == ["license", "apache"]
    assert p.should == []


def test_mixed_and_or():
    p = parse("a AND b c")
    assert p.must == ["a", "b"]
    assert p.should == ["c"]


def test_not_and_minus():
    p = parse("license NOT apache -software")
    assert p.should == ["license"]
    assert p.must_not == ["apache", "software"]


def test_plus_required():
    p = parse("+license apache")
    assert p.must == ["license"]
    assert p.should == ["apache"]


def test_phrase():
    p = parse('"Apache Software Foundation"')
    assert p.phrases == [["apache", "software", "foundation"]]


def test_field_prefix_stripped():
    p = parse("content:license")
    assert p.should == ["license"]


def test_symbol_operators():
    p = parse("a && b || c")
    assert p.must == ["a", "b"]
    assert p.should == ["c"]


def test_analyzer_applied():
    p = parse("LiCeNsE Don't")
    assert p.should[0] == "license"
    assert "don't" in p.should


def test_parsed_execution_matches_engine(built_index):
    _, oracle, searcher = built_index
    got = [(r["docID"], r["score"]) for r in execute(searcher, "license apache", k=10).collect()]
    exp = oracle.search(["license", "apache"], k=10, mode="or")
    assert_rank_identical(exp, got, msg="[parser or]")

    got = [(r["docID"], r["score"]) for r in execute(searcher, "license AND apache", k=10).collect()]
    exp = oracle.search(["license", "apache"], k=10, mode="and")
    assert_rank_identical(exp, got, msg="[parser and]")

    got = [(r["docID"], r["score"]) for r in execute(searcher, "license NOT var0", k=10).collect()]
    exp = oracle.search_boolean(should=["license"], must_not=["var0"], k=10)
    assert_rank_identical(exp, got, msg="[parser not]")

    got = [(r["docID"], r["score"]) for r in execute(searcher, '"apache software foundation"', k=10).collect()]
    exp = oracle.search_phrase(["apache", "software", "foundation"], k=10)
    assert_rank_identical(exp, got, msg="[parser phrase]")
