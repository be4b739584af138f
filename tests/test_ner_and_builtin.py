"""Dictionary NER (prefix-ratio acceptance, ner.c:20-37) and built-in FSM
miners (naive_email semantics + url/date/phone)."""

import pytest

from nativeextractor_ray.miners import (
    DateMiner,
    DictionaryMiner,
    EmailMiner,
    PhoneMiner,
    UrlMiner,
)


# ---- NER prefix-ratio threshold (ner.c:31) --------------------------------

NAMES = ["erin", "ivan", "nora", "xenia", "yuri", "zelda"]


@pytest.mark.parametrize(
    "token,accepted",
    [
        ("erin", True),       # exact: 4/4
        ("eri", True),        # prefix of a word: 3/3 = 1.0
        ("e", True),          # 1/1 = 1.0 — short prefixes score full
        ("erinx", True),      # 4/5 = 0.8 >= 0.75
        ("erinxx", False),    # 4/6 = 0.667 < 0.75
        ("erin,", True),      # 4/5 with trailing punct — tokens are
        #                       non-space runs, punct included (ner.c:26)
        ("zzz", False),
        ("xenia!!", False),   # 5/7 < 0.75
        ("nora.", True),      # 4/5
    ],
)
def test_prefix_ratio(token, accepted):
    m = DictionaryMiner(NAMES, label="Dict")
    got = m.find(token)
    assert bool(got) is accepted, token


def test_ratio_is_in_bytes_not_codepoints():
    # 'řek' is 4 bytes; dictionary 'ř' shares 2 bytes → 2/4 = 0.5 reject;
    # dictionary 'řek' → 4/4 accept
    assert not DictionaryMiner(["ř"]).find("řek")
    assert DictionaryMiner(["řek"]).find("řek")


def test_ner_tokens_and_spans():
    m = DictionaryMiner(NAMES, label="Dict")
    got = m.mentions("say hi to erin and ivan, ok?")
    assert [(x.surface, x.pos, x.len) for x in got] == [
        ("erin", 10, 4),
        ("ivan,", 19, 5),
    ]


def test_ner_bof_leading_delimiter_consumed():
    # a stream-begin token starting with a delimiter loses its first char to
    # the anchor's match_delimiter(Right) move (ner.c:24)
    m = DictionaryMiner(NAMES)
    got = m.find("(erin says")
    assert got and got[0][0] == 1  # span starts after '('
    # mid-text, the leading punct stays in the token (anchor was the space)
    got = m.find("hi (erin")
    assert not got  # token '(erin' → lcp 0


# ---- naive email (naive_email_miner.c:29-148) ------------------------------

@pytest.mark.parametrize(
    "text,spans",
    [
        ("mail blah@seznam.com now", [("blah@seznam.com")]),
        ("x a@b.c y", []),                      # last subdomain < 2 chars
        ("x a@b.co y", [("a@b.co")]),
        ("x a@bc y", []),                       # single subdomain
        ("x a@b..com y", [("a@b..com")]),       # empty inner subdomain ok
        ("@x.com", []),                         # no left context
        ("x a@b.com.c y", []),                  # bad last subdomain, no backtrack
        ("a.b-c_9@mail.example.org!", [("a.b-c_9@mail.example.org")]),
        ("a@b@c.com", [("b@c.com")]),           # first @ fails, second wins
    ],
)
def test_email(text, spans):
    got = [m.surface for m in EmailMiner().mentions(text)]
    assert got == list(spans), text


def test_email_nonoverlap():
    got = [m.surface for m in EmailMiner().mentions("a@x.com b@y.org")]
    assert got == ["a@x.com", "b@y.org"]


# ---- url / date / phone ----------------------------------------------------

def test_url():
    got = [m.surface for m in UrlMiner().mentions("a http://www.root.cz?limit=20 xxd https://x.io/y z")]
    assert got == ["http://www.root.cz?limit=20", "https://x.io/y"]


def test_date():
    got = [m.surface for m in DateMiner().mentions("on 2024-03-07 or 7.3.2024 ok 20240307")]
    assert got == ["2024-03-07", "7.3.2024"]


def test_phone():
    got = [m.surface for m in PhoneMiner().mentions("call +420123456789 or +12 now")]
    assert got == ["+420123456789"]
