"""Streaming & observability (SURVEY.md §2.7): progress metrics, rate
windows, and the Structured-Streaming attempt-log pipeline.
"""
