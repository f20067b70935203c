"""Command-line entry points (same flag surface as the reference scripts)."""
