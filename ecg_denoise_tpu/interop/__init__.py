"""Interop with the PyTorch reference: weight transfer + checkpoint import.

Lazy imports only — this package pulls in torch, which must stay optional.
"""
