"""Generic relational coverage the reference lacks entirely (SURVEY.md §2.7)
— joins, aggregations, windows, grouping sets, set ops, JSON/string/date/math
functions — exercised over the TPC-H-ish fixtures. All built-ins, all
Catalyst-optimized."""
