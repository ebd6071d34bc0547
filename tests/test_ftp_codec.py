"""FTP RFC 959 codec: command/reply round-trips incl. multi-line replies
split across reads, PASV/EPSV parsing, MLSD facts, and the tail/update
monitor state machine + Spark line-framing path."""

import pytest

from kafka_stream_spark.sources import ftp_codec as f


def test_command_encoding_and_injection_guard():
    assert f.encode_command("cwd", "/data") == b"CWD /data\r\n"
    assert f.encode_command("QUIT") == b"QUIT\r\n"
    with pytest.raises(ValueError):
        f.encode_command("CWD", "/x\r\nDELE y")


def test_single_line_replies():
    buf = b"220 Service ready\r\n331 User name okay, need password\r\n"
    replies, rest = f.decode_replies(buf)
    assert [(r.code, r.text) for r in replies] == [
        (220, "Service ready"),
        (331, "User name okay, need password"),
    ]
    assert rest == b""


def test_multi_line_reply_with_embedded_codes():
    # §4.2: inner lines may START with digits; only "214 " closes it
    buf = (
        b"214-The following commands are recognized.\r\n"
        b" USER PASS CWD\r\n"
        b"214000 looks like a code but is not the terminator\r\n"
        b"214 Help OK.\r\n"
        b"221 Bye\r\n"
    )
    replies, rest = f.decode_replies(buf)
    assert replies[0].code == 214
    assert len(replies[0].lines) == 4
    assert replies[0].lines[-1] == "Help OK."
    assert replies[1].code == 221
    assert rest == b""


def test_reply_split_across_reads():
    whole = b"226-Transfer starting\r\nbytes: 42\r\n226 Transfer complete\r\n"
    for cut in range(1, len(whole)):
        first, rest_in = whole[:cut], whole[cut:]
        replies, rest = f.decode_replies(first)
        replies2, rest2 = f.decode_replies(rest + rest_in)
        all_replies = replies + replies2
        assert len(all_replies) == 1, cut
        assert all_replies[0].lines[-1] == "Transfer complete"
        assert rest2 == b""


def test_pasv_epsv_parsing():
    r, _ = f.decode_replies(b"227 Entering Passive Mode (192,168,1,9,19,137)\r\n")
    assert f.parse_pasv(r[0]) == ("192.168.1.9", 19 * 256 + 137)
    r, _ = f.decode_replies(b"229 Entering Extended Passive Mode (|||6010|)\r\n")
    assert f.parse_epsv(r[0]) == 6010
    with pytest.raises(ValueError):
        f.parse_pasv(f.Reply(229, ["wrong code"]))


def test_mlsd_facts():
    e = f.parse_mlsd_line("type=file;size=432;modify=20260301120000; data.csv")
    assert e == {
        "name": "data.csv", "type": "file", "size": 432,
        "modify": "20260301120000",
    }
    d = f.parse_mlsd_line("type=dir;modify=20260101000000; logs")
    assert d["type"] == "dir"
    with pytest.raises(ValueError):
        f.parse_mlsd_line("type=file;size=1;")


def _fetcher(store):
    def fetch(name, offset):
        return store[name][offset:]
    return fetch


def test_monitor_update_mode_emits_whole_file_on_change():
    store = {"a.log": b"one\n"}
    listing = [{"type": "file", "name": "a.log", "size": 4, "modify": "t1"}]
    state: dict = {}
    out = f.poll_monitor(state, listing, _fetcher(store), "update")
    assert out == [{"name": "a.log", "offset": 0, "body": b"one\n"}]
    # unchanged -> nothing
    assert f.poll_monitor(state, listing, _fetcher(store), "update") == []
    # changed -> whole body again
    store["a.log"] = b"one\ntwo\n"
    listing = [{"type": "file", "name": "a.log", "size": 8, "modify": "t2"}]
    out = f.poll_monitor(state, listing, _fetcher(store), "update")
    assert out[0]["offset"] == 0 and out[0]["body"] == b"one\ntwo\n"


def test_monitor_tail_mode_emits_appended_suffix_only():
    store = {"a.log": b"one\n"}
    state: dict = {}
    l1 = [{"type": "file", "name": "a.log", "size": 4, "modify": "t1"}]
    f.poll_monitor(state, l1, _fetcher(store), "tail")
    store["a.log"] = b"one\ntwo\n"
    l2 = [{"type": "file", "name": "a.log", "size": 8, "modify": "t2"}]
    out = f.poll_monitor(state, l2, _fetcher(store), "tail")
    assert out == [{"name": "a.log", "offset": 4, "body": b"two\n"}]
    # truncate/rewrite -> re-emit from 0 (tail can't diff a shrink)
    store["a.log"] = b"new\n"
    l3 = [{"type": "file", "name": "a.log", "size": 4, "modify": "t3"}]
    out = f.poll_monitor(state, l3, _fetcher(store), "tail")
    assert out[0]["offset"] == 0 and out[0]["body"] == b"new\n"
    # directories never emit
    assert f.poll_monitor(state, [{"type": "dir", "name": "d", "size": 0}],
                          _fetcher(store), "tail") == []


def test_monitored_records_df(spark):
    rows = [
        ("a.log", 0, b"alpha\nbeta\n"),
        ("b.log", 10, b"gamma\n\ndelta"),  # empty line skipped, offsets kept
    ]
    df = spark.createDataFrame(rows, "name string, offset long, body binary")
    out = {(r.file_name, r.byte_offset): r.line
           for r in f.monitored_records_df(df).collect()}
    assert out == {
        ("a.log", 0): "alpha",
        ("a.log", 6): "beta",
        ("b.log", 10): "gamma",
        ("b.log", 17): "delta",
    }


def test_monitored_records_crlf_lines_stripped(spark):
    import pandas as pd

    from kafka_stream_spark.sources import ftp_codec as f

    df = spark.createDataFrame(
        [("w.txt", 0, bytearray(b"alpha\r\nbeta\r\n\r\ngamma"))],
        "name string, offset long, body binary",
    )
    rows = sorted(
        (r.byte_offset, r.line)
        for r in f.monitored_records_df(df).collect()
    )
    # \r never reaches the record text; blank CRLF line skipped;
    # offsets still count raw bytes (CR included)
    assert rows == [(0, "alpha"), (7, "beta"), (15, "gamma")]
