"""Failure-notification adapters for ``CopyEngine.run(notify=...)``.

The reference mails the exception + stack trace on any job error
(``EmailUtil.java:21-111``) with these semantics, reproduced here:

- ``enabled`` false  -> log and skip (EmailUtil.java:58-62);
- missing server/port -> warn and skip (EmailUtil.java:64-68);
- empty subject      -> default subject (EmailUtil.java:55-56);
- username+password  -> authenticated session with STARTTLS
  (EmailUtil.java:75-88);
- body = message + stack trace (EmailUtil.java:28-31).

The engine stays transport-agnostic: ``run(notify=...)`` takes any callable
and swallows its failures. ``smtp_notifier`` builds one such callable from
mail settings; tests inject a fake transport via ``smtp_factory``.
"""

from __future__ import annotations

import logging
import smtplib
import traceback
from collections.abc import Callable
from dataclasses import dataclass
from email.message import EmailMessage

log = logging.getLogger(__name__)

DEFAULT_SUBJECT = "Error in copy job"  # EmailUtil.java:55-56 analog


@dataclass(frozen=True)
class MailSettings:
    """Mail config (reference CONFIG_KEYS MAIL_* family)."""

    server: str = ""
    port: int = 0
    mail_from: str = ""
    mail_to: str = ""  # comma-separated recipients
    subject: str = ""
    username: str = ""
    password: str = ""
    enabled: bool = False


def format_failure(exc: BaseException) -> str:
    """Message body: exception message + stack trace (EmailUtil.java:28-31)."""
    trace = "".join(traceback.format_exception(type(exc), exc, exc.__traceback__))
    return f"{exc}\n\n{trace}"


def smtp_notifier(
    settings: MailSettings,
    *,
    smtp_factory: Callable[[str, int], smtplib.SMTP] = smtplib.SMTP,
) -> Callable[[BaseException], None]:
    """Build a ``notify`` callable for :meth:`CopyEngine.run`."""

    def notify(exc: BaseException) -> None:
        if not settings.enabled:
            log.info("not sending e-mail, error mails disabled")
            return
        if not settings.server or not settings.port:
            log.warning("not sending e-mail, no e-mail properties set")
            return
        msg = EmailMessage()
        msg["From"] = settings.mail_from
        msg["To"] = settings.mail_to
        msg["Subject"] = settings.subject or DEFAULT_SUBJECT
        msg.set_content(format_failure(exc))
        log.info("sending failure e-mail to %s", settings.mail_to)
        with smtp_factory(settings.server, settings.port) as smtp:
            if settings.username and settings.password:
                smtp.starttls()
                smtp.login(settings.username, settings.password)
            smtp.send_message(msg)
        log.info("failure e-mail sent")

    return notify
