"""Plans package: physical-plan introspection utilities."""
