"""Scalar-function layer: the formula DSL compiler, time helpers, and text
analysis functions — all compiled to native Spark ``Column`` expressions so
Catalyst sees through every one of them (zero row-at-a-time Python UDFs,
SURVEY.md §2.8)."""
