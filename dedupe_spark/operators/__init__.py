"""Relational operators: blocking, scoring, clustering, representatives."""
