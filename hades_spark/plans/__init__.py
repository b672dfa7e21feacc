"""Declarative plans: schema-driven graph materialization, named graphs."""
