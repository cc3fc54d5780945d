"""Core engine subpackage (calculator DAG evaluation)."""
