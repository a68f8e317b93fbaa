"""SMTP failure-notification adapter (reference EmailUtil semantics) with an
injected fake transport — no network involved."""

from __future__ import annotations

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
