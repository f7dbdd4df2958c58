"""Training subsystem (ref: train_model.py — SURVEY.md §3 L5)."""
