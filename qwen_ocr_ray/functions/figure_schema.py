"""Structured-output validation at the VLM boundary (pydantic).

Fresh implementation of the reference's eager response validation: the
reference parses figure JSON straight into ``ImageExtractionResponse``
(/root/reference/src/models/api_schemas.py:10-79) at the API call site
(/root/reference/src/models/document_job.py:187-201), so malformed rows
never reach the crop stage. Same contract here, adapted to this engine's
conventions: bboxes are NORMALIZED 0-1000 (matching FIGURES_SYSTEM_PROMPT
and the stub), accepted either as a ``bbox`` 4-tuple (live JSON shape) or
flat ``x1..y2`` keys (stub shape), always normalized to flat keys for the
vectorized filter/crop stages.
"""

from __future__ import annotations

from typing import Literal

from pydantic import BaseModel, Field, model_validator

ELEMENT_TYPES = (
    "chart", "graph", "diagram", "algorithm", "table", "screenshot", "other"
)

BBOX_MAX = 1000  # normalized coordinate space


class FigureMetadata(BaseModel):
    """One detected figure (reference ImageMetadata semantics,
    src/models/image_metadata.py:7-...; element_type categories identical)."""

    page_number: int = Field(ge=1)
    fig_number: int = Field(ge=1)
    x1: int
    y1: int
    x2: int
    y2: int
    caption: str | None = None
    element_type: Literal[
        "chart", "graph", "diagram", "algorithm", "table", "screenshot", "other"
    ] = "other"

    @model_validator(mode="before")
    @classmethod
    def _accept_bbox_tuple(cls, data):
        if isinstance(data, dict) and "bbox" in data and "x1" not in data:
            data = dict(data)
            bbox = data.pop("bbox")
            if not (isinstance(bbox, (list, tuple)) and len(bbox) == 4):
                raise ValueError(f"bbox must be a 4-element sequence, got {bbox!r}")
            data["x1"], data["y1"], data["x2"], data["y2"] = bbox
        return data

    @model_validator(mode="after")
    def _bbox_ordered_in_range(self):
        if not (
            0 <= self.x1 < self.x2 <= BBOX_MAX
            and 0 <= self.y1 < self.y2 <= BBOX_MAX
        ):
            raise ValueError(
                f"bbox out of order/range (normalized 0-{BBOX_MAX}): "
                f"({self.x1},{self.y1},{self.x2},{self.y2})"
            )
        return self


class FigureExtractionResponse(BaseModel):
    """Top-level response: {"images": [...]} (api_schemas.py:8-12)."""

    images: list[FigureMetadata] = Field(default_factory=list)


def validate_figures(raw: object) -> list[dict]:
    """Validate a parsed figure payload; returns flat dicts for the crop
    stage. Accepts either the full response dict or a bare figure list.
    Raises ``pydantic.ValidationError`` on malformed input — callers decide
    per-page leniency (the reference treats an unparseable response as zero
    figures, document_job.py:196-201)."""
    payload = raw if isinstance(raw, dict) else {"images": raw}
    resp = FigureExtractionResponse.model_validate(payload)
    return [m.model_dump() for m in resp.images]
