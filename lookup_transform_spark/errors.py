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
    """One validation problem (message + corrective action + target).

    Mirrors ``FailureCollector.addFailure(message, correctiveAction)``
    plus the reference's three targeting affordances
    (Lookup.java:237-254's ``InvalidJoinException`` remap):

    - ``config_property`` — ``withConfigProperty(prop)`` (JOIN_KEY /
      JOIN_KEY_FIELD errors target ``input_key_field``;
      Lookup.java:240-243, 486-488);
    - ``config_element`` — ``withConfigElement(prop, element)``: the
      failure points at ONE element of a multi-valued property, e.g.
      ``("lookup_value_field", "lkp.category as category")`` for a
      SELECTED_FIELD error (Lookup.java:244-248);
    - ``output_schema_field`` — ``withOutputSchemaField(field)`` for an
      OUTPUT_SCHEMA error (Lookup.java:249-252).
    """

    message: str
    corrective_action: str = ""
    config_property: str | None = None
    config_element: tuple[str, str] | None = None
    output_schema_field: str | None = None

    def __str__(self) -> str:
        parts = [self.message]
        if self.corrective_action:
            parts.append(self.corrective_action)
        if self.config_property:
            parts.append(f"(property: {self.config_property})")
        if self.config_element:
            prop, element = self.config_element
            parts.append(f"(element: {prop}[{element}])")
        if self.output_schema_field:
            parts.append(f"(output schema field: {self.output_schema_field})")
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
        config_element: tuple[str, str] | None = None,
        output_schema_field: str | None = None,
    ) -> None:
        self.failures.append(
            ValidationFailure(
                message,
                corrective_action,
                config_property,
                config_element,
                output_schema_field,
            )
        )

    def raise_if_any(self) -> None:
        if self.failures:
            raise LookupConfigError(self.failures)
