"""Seeded synthetic e-commerce fixture generator (SURVEY §2.8 G2).

Re-specifies the reference's sample-data generator semantics (reference:
data/generators/generate_sample_data.py:26-292) without porting it:
deterministic seed, injected quality defects with known expected outcomes —
~2% duplicate orders, forced nulls and negative totals, ~10% SCD2
address changes (plus a Type-1 phone change) in a second "update" file,
order items (1-5 per order), daily inventory snapshot files — so pipeline
tests can assert exact post-Silver/Gold cardinalities.

Driver-side plain Python by design: fixture generation is small; the
engine under test should not generate its own inputs distributed.
"""

from __future__ import annotations

import csv
import datetime as dt
import json
import os
import random
from dataclasses import dataclass

STATUSES = ["pending", "processing", "shipped", "delivered", "cancelled"]
TIERS = ["bronze", "silver", "gold", "platinum"]
CITIES = ["Springfield", "Shelbyville", "Ogdenville", "North Haverbrook"]


@dataclass
class FixtureSpec:
    n_customers: int = 50
    n_products: int = 20
    n_orders: int = 200
    dupe_rate: float = 0.02
    null_rate: float = 0.01
    negative_rate: float = 0.01
    scd_change_rate: float = 0.10
    n_snapshot_days: int = 7
    seed: int = 42


def generate(out_dir: str, spec: FixtureSpec | None = None) -> dict[str, int]:
    """Write the raw fixture files; returns expected cardinalities."""
    spec = spec or FixtureSpec()
    rng = random.Random(spec.seed)
    os.makedirs(out_dir, exist_ok=True)

    customers = [
        {
            "customer_id": c,
            "first_name": f"  first{c} ",
            "last_name": f" LAST{c}  ",
            "email": f" User{c}@Example.COM ",
            "phone": f"(5{c % 10}8)349-5{c % 10}31x03{c % 10}1",
            "address_line1": f"  {100 + c} Main St ",
            "address_line2": f"Apt {c % 20}" if c % 3 == 0 else "",
            "city": rng.choice(CITIES).lower(),
            "state": rng.choice(["ny", "ca", "tx", "wa"]),
            "postal_code": f" {10000 + c * 7 % 90000:05d}"
            + ("-1234 " if c % 5 == 0 else " "),
            "country": None if c % 7 == 0 else " usa ",
            "customer_status": rng.choice([" ACTIVE ", " Inactive "]),
            "registration_date": f"2023-{1 + c % 12:02d}-{1 + c % 28:02d}",
            "marketing_opt_in": None if c % 11 == 0 else bool(c % 2),
            "customer_tier": rng.choice(TIERS),
            "updated_at": "2024-01-01T00:00:00",
        }
        for c in range(spec.n_customers)
    ]
    with open(os.path.join(out_dir, "customers_initial.json"), "w") as f:
        json.dump(customers, f)

    # SCD2 updates: address changes (Type-2: address_line1 + city +
    # postal_code) + a phone change (Type-1)
    n_changed = int(spec.n_customers * spec.scd_change_rate)
    changed = sorted(rng.sample(range(spec.n_customers), n_changed))
    updates = []
    for c in changed:
        u = dict(customers[c])
        u["address_line1"] = f" {900 + c} Relocation Ave "
        u["city"] = "capital city"
        u["postal_code"] = f"{20000 + c:05d}"
        u["phone"] = f"001-777-888-{c % 10}{c % 10}{(c + 1) % 10}{(c + 2) % 10}x42"
        u["updated_at"] = "2024-06-01T00:00:00"
        updates.append(u)
    with open(os.path.join(out_dir, "customers_update.json"), "w") as f:
        json.dump(updates, f)

    categories = [("electronics", "audio"), ("home", "kitchen"), ("toys", "games")]
    prices = {}
    with open(os.path.join(out_dir, "products.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(
            [
                "product_id", "product_name", "category", "subcategory",
                "brand", "description", "weight_kg", "is_active",
                "created_date", "unit_cost", "unit_price",
            ]
        )
        for p in range(spec.n_products):
            cost = round(rng.uniform(1, 50), 2)
            price = round(cost * rng.uniform(1.2, 2.0), 2)
            prices[p] = price
            cat, sub = categories[p % len(categories)]
            w.writerow(
                [
                    p,
                    f"product {p}",
                    f" {cat} ",
                    f" {sub} ",
                    f" brand{p % 4} ",
                    f"  description of product {p} ",
                    round(rng.uniform(0.1, 20), 2) if p % 6 else "",
                    "" if p % 9 == 0 else str(bool(p % 2)).lower(),
                    f"2022-{1 + p % 12:02d}-{1 + p % 28:02d}",
                    cost,
                    price,
                ]
            )

    # orders: pipe CSV over a full year so some orders postdate the SCD2
    # update (2024-06-01) — point-in-time joins must split around it
    order_rows = []
    base = dt.date(2024, 1, 1)
    # order items first (reference:201-246: totals derive FROM items —
    # order_total = Σ(line_total − discount_applied) + shipping_fee −
    # discount_amount, tax = 8% of the item subtotal)
    item_rows = []
    subtotals: dict[int, float] = {}
    item_id = 0
    for o in range(spec.n_orders):
        for _ in range(rng.randint(1, 5)):
            p = rng.randrange(spec.n_products)
            q = rng.randint(1, 3)
            line_total = round(q * prices[p], 2)
            discount = round(line_total * 0.1, 2) if rng.random() > 0.9 else 0
            item_rows.append(
                [item_id, o, p, q, prices[p], line_total, discount]
            )
            subtotals[o] = round(subtotals.get(o, 0) + line_total - discount, 2)
            item_id += 1
    with open(os.path.join(out_dir, "order_items.csv"), "w") as f:
        f.write(
            "order_item_id|order_id|product_id|quantity|unit_price"
            "|line_total|discount_applied\n"
        )
        for row in item_rows:
            f.write("|".join(str(x) for x in row) + "\n")

    payment_methods = [" CREDIT_CARD ", " Debit_Card ", " paypal ", " GIFT_CARD "]
    TOTAL = 4  # index of order_total in the row layout below
    for o in range(spec.n_orders):
        status = rng.choice(STATUSES)
        shipping_fee = round(rng.uniform(0, 20), 2)
        subtotal = subtotals.get(o, 0.0)
        # cap the order-level discount so only INJECTED defects go negative
        discount_amount = (
            round(min(rng.uniform(1, 15), subtotal * 0.5), 2) if o % 13 == 0 else 0.0
        )
        total: float | str = round(subtotal + shipping_fee - discount_amount, 2)
        tax = round(subtotal * 0.08, 2)
        if rng.random() < spec.null_rate:
            total = ""
        cust = rng.randrange(spec.n_customers)
        order_rows.append(
            [
                o,
                cust,
                (base + dt.timedelta(days=rng.randrange(365))).isoformat(),
                f" {status.upper()} ",
                total,
                tax,
                shipping_fee,
                discount_amount,
                f"{rng.randrange(24):02d}:{rng.randrange(60):02d}:{rng.randrange(60):02d}",
                rng.choice(payment_methods),
                f" {200 + o % 700} Shipping Rd ",
                rng.choice(CITIES).lower(),
                rng.choice(["ny", "ca", "tx", "wa"]),
                f"{30000 + o % 60000:05d}",
                " save10 " if o % 13 == 0 else "",
                f"  note for order {o} " if o % 17 == 0 else "",
            ]
        )
    n_negative = max(1, int(spec.n_orders * spec.negative_rate))
    for row in rng.sample(order_rows, n_negative):
        row[TOTAL] = -abs(row[TOTAL]) if row[TOTAL] != "" else -1.0
    n_dupes = int(spec.n_orders * spec.dupe_rate)
    duped = rng.sample(order_rows, n_dupes)
    n_bad_rows = sum(
        1 for r in order_rows if r[TOTAL] != "" and float(r[TOTAL]) < 0
    ) + sum(1 for r in duped if r[TOTAL] != "" and float(r[TOTAL]) < 0)
    order_rows.extend(list(r) for r in duped)
    rng.shuffle(order_rows)
    with open(os.path.join(out_dir, "orders.csv"), "w") as f:
        f.write(
            "order_id|customer_id|order_date|order_status|order_total"
            "|tax_amount|shipping_fee|discount_amount"
            "|order_time|payment_method|shipping_address|shipping_city"
            "|shipping_state|shipping_postal_code|discount_code|notes\n"
        )
        for row in order_rows:
            f.write("|".join(str(x) for x in row) + "\n")

    for day in range(spec.n_snapshot_days):
        snap_date = (base + dt.timedelta(days=day)).isoformat()
        snap = [
            {
                "product_id": p,
                "snapshot_date": snap_date,
                "warehouse_location": f" wh-{chr(97 + p % 3)} ",
                "quantity_on_hand": rng.randrange(0, 500),
                "quantity_reserved": rng.randrange(0, 50),
            }
            for p in range(spec.n_products)
        ]
        with open(os.path.join(out_dir, f"inventory_{snap_date}.json"), "w") as f:
            json.dump(snap, f)

    return {
        "customers": spec.n_customers,
        "customer_updates": n_changed,
        "products": spec.n_products,
        "orders_on_disk": spec.n_orders + n_dupes,
        "orders_unique": spec.n_orders,
        "orders_negative": n_negative,
        "order_rows_quarantined": n_bad_rows,
        "order_items": len(item_rows),
        "inventory_rows": spec.n_snapshot_days * spec.n_products,
    }
