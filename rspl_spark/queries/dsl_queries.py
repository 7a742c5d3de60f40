"""Queries exercising the rspl DSL layer (Get/Put stream processors compiled
to DataFrame ops). Filled in as the DSL lands (SURVEY.md §7 step 3)."""

from __future__ import annotations
