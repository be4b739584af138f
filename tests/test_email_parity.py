"""EmailMiner regex-candidate scan vs the direct per-'@' FSM rendering.

The fast ``find`` re-expresses the reference FSM
(/root/reference/src/example/naive_email_miner.c:29-148) as one compiled
regex pass plus O(1) post-checks per candidate; ``_find_fsm`` keeps the
literal FSM as the oracle.  The equivalence argument (builtin.py docstring)
leans on two facts checked here:

1. the regex class ``[\\w.-]`` equals ``_email_valid`` per codepoint, and
2. the candidate-match decomposition reproduces the FSM's anchor order,
   left-run and domain-run boundaries — fuzzed over an alphabet dense in
   '@' / '.' / delimiters to hit the abutting-candidate and mark_start
   refusal paths.
"""

import re

from hypothesis import given, settings, strategies as st

from nativeextractor_ray.miners.builtin import EmailMiner, _email_valid

SETTINGS = dict(max_examples=300, derandomize=True, deadline=None)

# dense in the FSM's decision chars: valid/invalid boundaries, dots,
# consecutive '@', unicode letters, and a non-alnum symbol
texts = st.text(alphabet=st.sampled_from("a b.@-_é五2,@@x."), max_size=60)


@settings(**SETTINGS)
@given(texts)
def test_find_equals_fsm(text):
    m = EmailMiner()
    assert m.find(text) == m._find_fsm(text), repr(text)


def test_regex_class_parity_sampled():
    """[\\w.-] == _email_valid on a deterministic codepoint sample (the
    full 0..0x10FFFF sweep was run once; this keeps a fast regression
    net over every block plus the known-tricky chars)."""
    pat = re.compile(r"[\w.\-]")
    tricky = [0x2D, 0x2E, 0x5F, 0x40, 0x20, 0xB2, 0xBD, 0x3007, 0x0F33,
              0x2070, 0x24EA, 0x661, 0x6F0, 0x2460, 0x10FFFF]
    sample = list(range(0, 0x110000, 257)) + tricky
    for cp in sample:
        c = chr(cp)
        assert (pat.match(c) is not None) == _email_valid(c), hex(cp)


def test_known_cases():
    m = EmailMiner()
    # abutting candidates: failed 'a@b' then the true email starting
    # inside the failed span
    assert [s for s, e, _ in m.find("a@b@c.com")] == [2]
    # mark_start refusal: second '@' whose left run reaches into the
    # accepted first span
    assert [(s, e) for s, e, _ in m.find("a@b.cd@e.fg")] == [(0, 6)]
    # empty inner subdomain allowed, short last subdomain rejected
    assert m.find("x@a..bc") and not m.find("x@a.b")
    # no left context
    assert not m.find("@x.com") and not m.find(" @x.com")
