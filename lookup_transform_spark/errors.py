"""Error taxonomy mirroring the reference's design-time validation.

The reference accumulates failures in a CDAP ``FailureCollector`` and
throws at the end of ``configurePipeline`` (Lookup.java:461-527). Each
failure carries a message, a corrective action, and the config property
it attaches to. We reproduce that surface: ``ValidationFailure`` is one
collected problem; ``LookupConfigError`` is the terminal exception
holding all of them.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class ValidationFailure:
    """One validation problem (message + corrective action + config property).

    Mirrors ``FailureCollector.addFailure(message, correctiveAction)
    .withConfigProperty(prop)`` (e.g. Lookup.java:486-488).
    """

    message: str
    corrective_action: str = ""
    config_property: str | None = None

    def __str__(self) -> str:
        parts = [self.message]
        if self.corrective_action:
            parts.append(self.corrective_action)
        if self.config_property:
            parts.append(f"(property: {self.config_property})")
        return " ".join(parts)


class LookupConfigError(ValueError):
    """Raised when design-time validation fails (Lookup.java:526 analog)."""

    def __init__(self, failures: list[ValidationFailure]):
        self.failures = list(failures)
        super().__init__("; ".join(str(f) for f in self.failures))


@dataclass
class FailureCollector:
    """Accumulates failures, then raises once — CDAP FailureCollector analog."""

    failures: list[ValidationFailure] = field(default_factory=list)

    def add(
        self,
        message: str,
        corrective_action: str = "",
        config_property: str | None = None,
    ) -> None:
        self.failures.append(
            ValidationFailure(message, corrective_action, config_property)
        )

    def raise_if_any(self) -> None:
        if self.failures:
            raise LookupConfigError(self.failures)
