"""Scalar/column function families (SURVEY.md §2.7) + multimodal plumbing."""
