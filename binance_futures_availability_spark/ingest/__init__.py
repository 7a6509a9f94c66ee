"""Ingestion layer — S11-S18: probing, discovery, kline parse, config.

Side-effecting, engine-adjacent clients (reference:
src/binance_futures_availability/probing/, validation/cross_check.py,
config/symbol_loader.py). Network transports are injectable callables so
tests run hermetically; parsers are pure and the bulk paths emit DataFrames.
"""
