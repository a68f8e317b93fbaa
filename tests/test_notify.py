"""SMTP failure-notification adapter (reference EmailUtil semantics) with an
injected fake transport — no network involved."""

from __future__ import annotations

import socket
import threading
import time

import pytest

from mssql2monetdb_spark.engine.notify import (
    DEFAULT_SUBJECT,
    MailSettings,
    format_failure,
    smtp_notifier,
)


class FakeSMTP:
    instances: list["FakeSMTP"] = []

    def __init__(self, server, port):
        self.server, self.port = server, port
        self.tls = False
        self.auth = None
        self.sent = []
        FakeSMTP.instances.append(self)

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def starttls(self):
        self.tls = True

    def login(self, user, pw):
        self.auth = (user, pw)

    def send_message(self, msg):
        self.sent.append(msg)


@pytest.fixture(autouse=True)
def _reset():
    FakeSMTP.instances.clear()


def _settings(**kw):
    base = dict(
        server="mail.host",
        port=25,
        mail_from="jobs@host",
        mail_to="ops@host",
        enabled=True,
    )
    base.update(kw)
    return MailSettings(**base)


def _boom() -> Exception:
    try:
        raise RuntimeError("load failed")
    except RuntimeError as exc:
        return exc


def test_sends_message_with_trace_and_default_subject():
    notify = smtp_notifier(_settings(), smtp_factory=FakeSMTP)
    notify(_boom())
    [smtp] = FakeSMTP.instances
    [msg] = smtp.sent
    assert msg["Subject"] == DEFAULT_SUBJECT
    assert msg["To"] == "ops@host"
    body = msg.get_content()
    assert "load failed" in body and "RuntimeError" in body and "Traceback" in body
    assert smtp.auth is None and not smtp.tls  # no creds -> plain session


def test_auth_uses_starttls():
    notify = smtp_notifier(_settings(username="u", password="p"), smtp_factory=FakeSMTP)
    notify(_boom())
    [smtp] = FakeSMTP.instances
    assert smtp.tls and smtp.auth == ("u", "p")


def test_disabled_skips_silently():
    notify = smtp_notifier(_settings(enabled=False), smtp_factory=FakeSMTP)
    notify(_boom())
    assert FakeSMTP.instances == []


def test_missing_server_skips():
    notify = smtp_notifier(_settings(server=""), smtp_factory=FakeSMTP)
    notify(_boom())
    assert FakeSMTP.instances == []


def test_custom_subject_kept():
    notify = smtp_notifier(_settings(subject="prod job down"), smtp_factory=FakeSMTP)
    notify(_boom())
    assert FakeSMTP.instances[0].sent[0]["Subject"] == "prod job down"


def test_format_failure_contains_chain():
    body = format_failure(_boom())
    assert body.startswith("load failed")


# ---------------------------------------------------------------------------
# Real-transport coverage: smtplib against an in-process SMTP server
# ---------------------------------------------------------------------------


class MiniSMTPServer(threading.Thread):
    """Just enough RFC 5321 to receive messages from a real smtplib.SMTP:
    greeting, EHLO/HELO, MAIL/RCPT, DATA with dot-termination, QUIT."""

    def __init__(self):
        super().__init__(daemon=True)
        self.sock = socket.create_server(("127.0.0.1", 0))
        self.port = self.sock.getsockname()[1]
        self.messages: list[bytes] = []

    def run(self):
        while True:
            try:
                conn, _ = self.sock.accept()
            except OSError:
                return
            with conn:
                f = conn.makefile("rb")
                conn.sendall(b"220 mini ESMTP\r\n")
                body: list[bytes] = []
                in_data = False
                while True:
                    line = f.readline()
                    if not line:
                        break
                    if in_data:
                        if line == b".\r\n":
                            in_data = False
                            self.messages.append(b"".join(body))
                            body = []
                            conn.sendall(b"250 OK\r\n")
                        else:
                            body.append(line)
                        continue
                    cmd = line.split(b" ", 1)[0].upper().rstrip()
                    if cmd == b"EHLO":
                        conn.sendall(b"250-mini\r\n250 OK\r\n")
                    elif cmd == b"DATA":
                        in_data = True
                        conn.sendall(b"354 end with <CRLF>.<CRLF>\r\n")
                    elif cmd == b"QUIT":
                        conn.sendall(b"221 bye\r\n")
                        break
                    else:  # HELO/MAIL/RCPT/RSET/...
                        conn.sendall(b"250 OK\r\n")

    def close(self):
        self.sock.close()


@pytest.fixture()
def mini_smtp():
    server = MiniSMTPServer()
    server.start()
    yield server
    server.close()


def test_real_smtplib_delivery(mini_smtp):
    """The default transport (no injected factory) delivers over a real
    socket: subject, recipients, and stack trace arrive intact."""
    notify = smtp_notifier(_settings(server="127.0.0.1", port=mini_smtp.port))
    notify(_boom())
    deadline = time.time() + 5
    while not mini_smtp.messages and time.time() < deadline:
        time.sleep(0.05)
    [raw] = mini_smtp.messages
    assert DEFAULT_SUBJECT.encode() in raw
    assert b"load failed" in raw and b"RuntimeError" in raw
    assert b"To: ops@host" in raw


def test_cli_failure_sends_mail_from_spec(spark, tmp_path, mini_smtp):
    """End-to-end reference operating mode: the spec's mail block turns a
    failing CLI run into a stack-trace e-mail (EmailUtil.java:21-111) and
    exit code 1."""
    import json

    from mssql2monetdb_spark.cli import main

    cfg_path = tmp_path / "spec.json"
    cfg_path.write_text(
        json.dumps(
            {
                "warehouse_dir": str(tmp_path / "wh"),
                "sources": {"_default": {"format": "parquet", "path": "/root/testdata/sf0.001"}},
                "tables": {
                    "bad": {
                        "from_table": None,
                        "from_query": "SELECT * FROM missing_table",
                        "count_query": "SELECT COUNT(*) FROM missing_table",
                        "to_table": "bad_t",
                    }
                },
                "mail": {
                    "server": "127.0.0.1",
                    "port": mini_smtp.port,
                    "from": "jobs@host",
                    "to": "ops@host",
                    "subject": "copy job down",
                },
            }
        )
    )
    assert main(["-c", str(cfg_path)]) == 1
    deadline = time.time() + 5
    while not mini_smtp.messages and time.time() < deadline:
        time.sleep(0.05)
    [raw] = mini_smtp.messages
    assert b"copy job down" in raw
    assert b"missing_table" in raw  # the analysis error + trace made it


def test_spec_mail_block_env_interpolation():
    from mssql2monetdb_spark.config.spec import load_spec

    spec = load_spec(
        {
            "warehouse_dir": "/tmp/wh",
            "sources": {"_default": {"format": "parquet", "path": "/tmp"}},
            "tables": {"j": {"from_table": "t"}},
            "mail": {
                "server": "mail.host",
                "port": "2525",
                "from": "a@b",
                "to": "c@d",
                "username": "u",
                "password": "${MAIL_PW}",
            },
        },
        env={"MAIL_PW": "s3cret"},
    )
    assert spec.mail is not None
    assert spec.mail.port == 2525 and spec.mail.enabled
    assert spec.mail.password == "s3cret"


def test_spec_without_mail_block():
    from mssql2monetdb_spark.config.spec import load_spec

    spec = load_spec(
        {
            "warehouse_dir": "/tmp/wh",
            "sources": {"_default": {"format": "parquet", "path": "/tmp"}},
            "tables": {"j": {"from_table": "t"}},
        }
    )
    assert spec.mail is None
