"""Offline tooling: WER scoring, text cleaning, posterior analysis."""
