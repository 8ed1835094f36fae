"""Query planning & execution: parse, expand, score, blend, evaluate."""
