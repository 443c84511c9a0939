"""Operator library: cleaning rules, gold builders, north-star ops."""
