"""Lexer tests (reference: src/parser.cpp:59-135)."""

from circuitsimulator_tpu.netlist.lexer import lex_text


def toks(text):
    return [s.tokens for s in lex_text(text)]


def test_basic_tokenize():
    assert toks("R1 1 2 10\nC1 2 0 1u\n") == [["R1", "1", "2", "10"],
                                              ["C1", "2", "0", "1u"]]


def test_continuation_lines():
    out = lex_text("V1 1 0 SIN\n+ 1 0.5\n+ 1e6\nR1 1 0 50\n")
    assert out[0].tokens == ["V1", "1", "0", "SIN", "1", "0.5", "1e6"]
    assert out[0].line_no == 1
    assert out[1].tokens == ["R1", "1", "0", "50"]


def test_leading_continuation_starts_new_logical():
    out = lex_text("+ R1 1 0 50\n")
    assert out[0].tokens == ["R1", "1", "0", "50"]


def test_comments():
    out = lex_text("* a comment\n; another\nR1 1 0 1k $ inline\n")
    assert len(out) == 1
    assert out[0].tokens == ["R1", "1", "0", "1k"]


def test_comment_does_not_break_continuation():
    out = lex_text("V1 1 0 SIN\n* interleaved comment\n+ 1 2 3\n")
    assert out[0].tokens == ["V1", "1", "0", "SIN", "1", "2", "3"]


def test_crlf_and_blank_lines():
    out = lex_text("R1 1 0 1\r\n\r\n\nC1 1 0 2\r\n")
    assert [s.tokens[0] for s in out] == ["R1", "C1"]


def test_dollar_full_line():
    assert lex_text("$ whole line comment\nR1 1 0 1\n")[0].tokens[0] == "R1"


def test_line_numbers():
    out = lex_text("* c\nR1 1 0 1\n\nC1 1 0 2\n")
    assert [s.line_no for s in out] == [2, 4]
