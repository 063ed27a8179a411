// SPDX-License-Identifier: LGPL-3.0+
pragma solidity ^0.5.0;

/** Standard truffle migrations bookkeeping contract. */
contract Migrations
{
    address public owner;
    uint public last_completed_migration;

    modifier restricted()
    {
        if (msg.sender == owner) _;
    }

    constructor() public
    {
        owner = msg.sender;
    }

    function setCompleted(uint completed) public restricted
    {
        last_completed_migration = completed;
    }

    function upgrade(address new_address) public restricted
    {
        Migrations upgraded = Migrations(new_address);
        upgraded.setCompleted(last_completed_migration);
    }
}
